#!/bin/bash
# COCO 2017 download (labels + images) into ../coco, YOLO layout.
# Counterpart of the reference's scripts/get_coco.sh:1-22.
set -e

d='../coco'
mkdir -p "$d" && cd "$d"

# labels (YOLO-format txt)
curl -L https://github.com/ultralytics/yolov5/releases/download/v1.0/coco2017labels-segments.zip -o labels.zip
unzip -q labels.zip && rm labels.zip

# images
for f in train2017.zip val2017.zip test2017.zip; do
  curl -L "http://images.cocodataset.org/zips/$f" -o "$f"
  unzip -q "$f" -d images && rm "$f" &
done
wait
echo "COCO ready at $d"
