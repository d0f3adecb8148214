"""Datasets: YOLO-format image/label discovery, verification cache, and
fixed-shape batch assembly.

CPU side of the pipeline (image decode + resize only — everything after
the H2D transfer is on-device, see data/augment.py). Mirrors the
reference's LoadImagesAndLabels discovery and label verification
(reference utils/datasets.py:353-523) with a .cache file, but emits
fixed-shape arrays: images are longest-side-resized to `img_size` and
padded bottom/right; labels are padded to `max_labels` with a mask.

Also provides a synthetic dataset (random colored boxes on noise) so the
full train/eval stack is exercisable without external downloads.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from pathlib import Path
from typing import Iterator

import numpy as np

IMG_FORMATS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def load_dataset_spec(path: str | Path) -> dict:
    """Parse a reference-style dataset YAML (train/val/test paths, nc,
    names, optional download command — reference
    data/Rep-YOLO_MPdataset.yaml, utils/general.py check_dataset):
    returns {train, val, test, nc, names, download}. Relative paths
    resolve against the YAML's directory. The download command is
    returned, never executed."""
    import yaml

    path = Path(path)
    with open(path) as f:
        spec = yaml.safe_load(f)
    out = {"nc": int(spec.get("nc", 1)),
           "names": [str(n) for n in spec.get("names", [])],
           "download": spec.get("download")}
    if out["names"] and len(out["names"]) != out["nc"]:
        raise ValueError(
            f"{path}: {len(out['names'])} names but nc={out['nc']} "
            "(reference train.py:85 asserts this)")
    for split in ("train", "val", "test"):
        v = spec.get(split)
        if v is None:
            out[split] = None
            continue
        items = v if isinstance(v, list) else [v]
        resolved = []
        for it in items:
            p = Path(str(it))
            resolved.append(str(p if p.is_absolute() else path.parent / p))
        out[split] = resolved if isinstance(v, list) else resolved[0]
    return out


def _img2label(p: str) -> str:
    """images/... .jpg -> labels/... .txt (reference utils/datasets.py:346-349)."""
    sa = f"{os.sep}images{os.sep}"
    sb = f"{os.sep}labels{os.sep}"
    stem, _ = os.path.splitext(p)
    if sa in stem:
        stem = stem.replace(sa, sb)
    return stem + ".txt"


def discover_images(path: "str | Path | list") -> list[str]:
    """Expand a dir / txt-list / list-of-either into an image file list
    (reference utils/datasets.py:365-385)."""
    if isinstance(path, (list, tuple)):
        out: list[str] = []
        for p in path:
            out += discover_images(p)
        return out
    path = Path(path)
    files: list[str] = []
    if path.is_dir():
        files = sorted(str(p) for p in path.rglob("*")
                       if p.suffix.lower() in IMG_FORMATS)
    elif path.is_file() and path.suffix == ".txt":
        base = path.parent
        for line in path.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            p = Path(line)
            files.append(str(p if p.is_absolute() else base / p))
    else:
        raise FileNotFoundError(f"no images at {path}")
    return files


def read_image(path: str) -> np.ndarray:
    """Decode an image file to RGB float32 HWC (cv2 with PIL fallback)."""
    try:
        import cv2

        img = cv2.imread(path)
        assert img is not None, f"image not found: {path}"
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"), np.float32)


def load_label_file(path: str, nc: int) -> np.ndarray:
    """Parse one YOLO label txt -> (n,5) [cls,x,y,w,h]; verify like the
    reference cache (reference utils/datasets.py:477-509)."""
    if not os.path.exists(path):
        return np.zeros((0, 5), np.float32)
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 5:
                rows.append([float(x) for x in parts[:5]])
    if not rows:
        return np.zeros((0, 5), np.float32)
    l = np.asarray(rows, np.float32)
    assert (l >= 0).all(), f"negative labels in {path}"
    assert (l[:, 1:] <= 1).all(), f"non-normalized coords in {path}"
    assert (l[:, 0] < nc).all(), f"class id >= nc in {path}"
    l = np.unique(l, axis=0) if len(l) != len(np.unique(l, axis=0)) else l
    return l


def _cache_key(files: list[str], nc: int) -> str:
    """Hash of the image list + image/label sizes+mtimes + nc — invalidates
    on any added/removed/edited file (reference keys its cache on a hash of
    the label+image paths and re-verifies on size change,
    utils/datasets.py:470-523). nc is part of the key because cache hits
    skip load_label_file's `cls < nc` validation: a cache built with a
    larger --nc must not satisfy a run with a smaller one."""
    h = hashlib.md5()
    h.update(f"nc={nc}".encode())
    for f in files:
        h.update(f.encode())
        for p in (f, _img2label(f)):
            try:
                st = os.stat(p)
                h.update(f"{st.st_size},{st.st_mtime_ns}".encode())
            except OSError:
                h.update(b"missing")
    return h.hexdigest()


def _cache_path_for(path: Path) -> Path:
    return (path / "labels.cache.npz") if path.is_dir() \
        else path.with_suffix(".cache.npz")


def load_labels_cached(files: list[str], nc: int,
                       cache_path: Path | None) -> list[np.ndarray]:
    """Parse + verify all label files, memoized in a single .npz keyed on
    the dataset hash (ragged labels stored as one (N,5) array + counts)."""
    key = _cache_key(files, nc)
    if cache_path is not None and cache_path.exists():
        try:
            with np.load(cache_path, allow_pickle=False) as z:
                if str(z["key"]) == key:
                    counts = z["counts"]
                    data = z["data"]
                    offs = np.concatenate([[0], np.cumsum(counts)])
                    return [data[offs[i]:offs[i + 1]]
                            for i in range(len(counts))]
        except Exception:
            pass  # corrupt/stale cache: fall through to re-parse
    labels = [load_label_file(_img2label(f), nc) for f in files]
    if cache_path is not None:
        try:
            data = (np.concatenate(labels, axis=0) if labels
                    else np.zeros((0, 5), np.float32))
            np.savez(cache_path, key=key,
                     counts=np.asarray([len(l) for l in labels], np.int64),
                     data=data)
        except OSError:
            pass  # read-only dataset dir: cache is best-effort
    return labels


@dataclasses.dataclass
class DetectionDataset:
    """Fixed-shape detection dataset."""

    img_files: list[str]
    labels: list[np.ndarray]          # per-image (n,5) [cls,xywhn]
    img_size: int = 640
    max_labels: int = 120
    nc: int = 1

    @classmethod
    def from_path(cls, path: str, img_size: int = 640, nc: int = 1,
                  max_labels: int = 120, cache: bool = True
                  ) -> "DetectionDataset":
        files = discover_images(path)
        first = path[0] if isinstance(path, (list, tuple)) else path
        cache_path = _cache_path_for(Path(first)) if cache else None
        labels = load_labels_cached(files, nc, cache_path)
        return cls(img_files=files, labels=labels, img_size=img_size,
                   max_labels=max_labels, nc=nc)

    def __len__(self) -> int:
        return len(self.img_files)

    def image_shapes(self) -> np.ndarray:
        """(n, 2) original (h, w) per image — header-only reads (PIL),
        memoized; the rect-eval batcher sorts by these (the reference
        caches shapes in its label .cache, utils/datasets.py:489)."""
        if getattr(self, "_shapes", None) is None:
            from PIL import Image

            shapes = []
            for f in self.img_files:
                with Image.open(f) as im:
                    w, h = im.size
                shapes.append((h, w))
            self._shapes = np.asarray(shapes, np.float32)
        return self._shapes

    def cache_images(self, mode: str = "ram", workers: int = 8) -> None:
        """Pre-decode every image (reference --cache-images,
        utils/datasets.py:448-468). `ram`: resized canvases held in
        memory (S*S*3 bytes each). `disk`: canvases written once as
        sibling .npy files (decode-free np.load afterwards; survives
        across runs)."""
        assert mode in ("ram", "disk"), mode
        from concurrent.futures import ThreadPoolExecutor

        self._cache_mode = mode
        if mode == "ram":
            self._ram: dict = {}
            with ThreadPoolExecutor(workers) as ex:
                for i, item in enumerate(ex.map(self._decode_canvas,
                                                range(len(self)))):
                    self._ram[i] = item
        else:
            def write(i):
                p = self._npy_path(i)
                if not p.exists():
                    canvas, hw, orig = self._decode_canvas(i)
                    np.save(p, canvas)
                    np.save(str(p)[:-4] + ".hw.npy",
                            np.concatenate([hw, orig]))
            with ThreadPoolExecutor(workers) as ex:
                list(ex.map(write, range(len(self))))

    def _npy_path(self, i: int) -> Path:
        return Path(self.img_files[i]).with_suffix(
            f".r{self.img_size}.npy")

    def _decode_canvas(self, i: int):
        """-> (canvas (S,S,3) uint8, hw (2,), orig (2,)): aspect-kept
        resize (longest side = S), content top-left, pad 114
        (mosaic-style load_image, reference utils/datasets.py:660-680)."""
        import cv2

        S = self.img_size
        img = cv2.imread(self.img_files[i])  # BGR
        assert img is not None, f"image not found {self.img_files[i]}"
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        h0, w0 = img.shape[:2]
        r = S / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if r < 1 else cv2.INTER_LINEAR
            img = cv2.resize(img, (int(w0 * r), int(h0 * r)),
                             interpolation=interp)
        h, w = img.shape[:2]
        canvas = np.full((S, S, 3), 114, np.uint8)
        canvas[:h, :w] = img
        return canvas, np.asarray([h, w], np.float32), \
            np.asarray([h0, w0], np.float32)

    def load_item(self, i: int):
        """-> (img (S,S,3) uint8 padded, hw (2,), labels (M,5), mask (M,),
        orig_shape (2,))."""
        mode = getattr(self, "_cache_mode", None)
        if mode == "ram":
            canvas, hw, orig = self._ram[i]
        elif mode == "disk":
            p = self._npy_path(i)
            canvas = np.load(p)
            hworig = np.load(str(p)[:-4] + ".hw.npy")
            hw, orig = hworig[:2], hworig[2:]
        else:
            canvas, hw, orig = self._decode_canvas(i)

        M = self.max_labels
        lab = np.zeros((M, 5), np.float32)
        mask = np.zeros((M,), bool)
        l = self.labels[i][:M]
        lab[: len(l)] = l
        mask[: len(l)] = True
        return canvas, hw, lab, mask, orig


def make_synthetic_dataset(n: int, img_size: int = 640, nc: int = 1,
                           max_labels: int = 120, seed: int = 0,
                           root: str | Path | None = None
                           ) -> DetectionDataset:
    """Random boxes-on-noise dataset written to disk (YOLO layout) so the
    full file-based pipeline (discovery, label parse, decode) is exercised.
    """
    import cv2

    rng = np.random.default_rng(seed)
    root = Path(root or Path.cwd() / "runs" / "synthetic")
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)
    files, labels = [], []
    for i in range(n):
        h = int(rng.integers(img_size // 2, img_size * 3 // 2))
        w = int(rng.integers(img_size // 2, img_size * 3 // 2))
        img = rng.integers(0, 80, (h, w, 3), np.uint8)
        k = int(rng.integers(1, 6))
        rows = []
        for _ in range(k):
            bw = float(rng.uniform(0.08, 0.4))
            bh = float(rng.uniform(0.08, 0.4))
            xc = float(rng.uniform(bw / 2, 1 - bw / 2))
            yc = float(rng.uniform(bh / 2, 1 - bh / 2))
            c = int(rng.integers(0, nc))
            x1 = int((xc - bw / 2) * w)
            y1 = int((yc - bh / 2) * h)
            x2 = int((xc + bw / 2) * w)
            y2 = int((yc + bh / 2) * h)
            color = tuple(int(v) for v in rng.integers(150, 255, 3))
            img[y1:y2, x1:x2] = color
            rows.append((c, xc, yc, bw, bh))
        fp = root / "images" / f"{i:05d}.jpg"
        cv2.imwrite(str(fp), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        (root / "labels" / f"{i:05d}.txt").write_text(
            "\n".join(f"{c} {x:.6f} {y:.6f} {bw:.6f} {bh:.6f}"
                      for c, x, y, bw, bh in rows))
        files.append(str(fp))
        labels.append(np.asarray(rows, np.float32))
    return DetectionDataset(img_files=files, labels=labels,
                            img_size=img_size, max_labels=max_labels, nc=nc)


class Loader:
    """Simple epoch loader: shuffles, assembles fixed-shape numpy batches.
    (Per-host sharding for multi-host: pass shard_index/num_shards.)"""

    def __init__(self, ds: DetectionDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 shard_index: int = 0, num_shards: int = 1):
        self.ds = ds
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards

    def __len__(self) -> int:
        n = len(self.ds) // self.num_shards
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def epoch_quad(self, epoch: int = 0) -> Iterator[dict]:
        """Quad collate (reference collate_fn4, utils/datasets.py:638-662):
        every 4 items become one 2S x 2S image — either the first item
        upscaled 2x (p=0.5) or the four stitched in a 2x2 grid — with
        labels re-normalized to the quad canvas. Batches have
        batch_size // 4 images at twice the resolution."""
        assert self.bs % 4 == 0, "quad collate needs batch_size % 4 == 0"
        rng = np.random.default_rng(self.seed + 1000 + epoch)
        S = self.ds.img_size
        for batch in self.epoch(epoch):
            imgs, hw = batch["images"], batch["hw"]
            labels, mask = batch["labels"], batch["mask"]
            B, M = mask.shape
            out_i, out_hw, out_l, out_m = [], [], [], []
            for g in range(0, B, 4):
                canvas = np.full((2 * S, 2 * S, 3), 114, imgs.dtype)
                # partial tail groups (drop_last=False) can't stitch 4
                if rng.random() < 0.5 or g + 4 > B:
                    # upscale item g 2x
                    h, w = int(hw[g][0]), int(hw[g][1])
                    big = np.repeat(np.repeat(
                        imgs[g][:h, :w], 2, 0), 2, 1)  # nearest 2x
                    canvas[: 2 * h, : 2 * w] = big
                    l = labels[g].copy()
                    m = mask[g].copy()
                    nh, nw = 2 * h, 2 * w
                    lab = np.zeros((4 * M, 5), np.float32)
                    msk = np.zeros((4 * M,), bool)
                    lab[:M] = l
                    msk[:M] = m
                    out_hw.append([nh, nw])
                else:
                    offs = [(0, 0), (0, S), (S, 0), (S, S)]
                    lab = np.zeros((4 * M, 5), np.float32)
                    msk = np.zeros((4 * M,), bool)
                    for j, (oy, ox) in enumerate(offs):
                        k = g + j
                        h, w = int(hw[k][0]), int(hw[k][1])
                        canvas[oy:oy + h, ox:ox + w] = imgs[k][:h, :w]
                        l = labels[k]
                        m = mask[k]
                        # normalized-to-content -> quad-canvas normalized
                        # (canvas content treated as the full 2S square)
                        ll = l.copy()
                        ll[:, 1] = (l[:, 1] * w + ox) / (2 * S)
                        ll[:, 2] = (l[:, 2] * h + oy) / (2 * S)
                        ll[:, 3] = l[:, 3] * w / (2 * S)
                        ll[:, 4] = l[:, 4] * h / (2 * S)
                        lab[j * M:(j + 1) * M] = ll
                        msk[j * M:(j + 1) * M] = m
                    out_hw.append([2 * S, 2 * S])
                out_i.append(canvas)
                out_l.append(lab)
                out_m.append(msk)
            yield dict(images=np.stack(out_i),
                       hw=np.asarray(out_hw, np.float32),
                       labels=np.stack(out_l), mask=np.stack(out_m),
                       orig_shapes=np.asarray(out_hw, np.float32),
                       indices=batch["indices"][::4])

    def epoch(self, epoch: int = 0,
              image_weights: "np.ndarray | None" = None) -> Iterator[dict]:
        if image_weights is not None:
            # weighted resample with replacement (reference train.py:324-330);
            # all-zero weights (label-free dataset / perfect per-class mAP)
            # degrade to uniform
            w = np.asarray(image_weights, np.float64)
            if w.sum() <= 0:
                w = np.ones_like(w)
            w = w / w.sum()
            idx = np.random.default_rng(self.seed + epoch).choice(
                len(self.ds), size=len(self.ds), replace=True, p=w)
        else:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(idx)
        idx = idx[self.shard_index::self.num_shards]
        nb = len(idx) // self.bs if self.drop_last else -(-len(idx) // self.bs)
        for b in range(nb):
            sel = idx[b * self.bs:(b + 1) * self.bs]
            items = [self.ds.load_item(i) for i in sel]
            yield dict(
                images=np.stack([it[0] for it in items]),
                hw=np.stack([it[1] for it in items]),
                labels=np.stack([it[2] for it in items]),
                mask=np.stack([it[3] for it in items]),
                orig_shapes=np.stack([it[4] for it in items]),
                indices=sel,
            )
