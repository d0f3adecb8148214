"""End-to-end learning sanity check: overfit one synthetic box and verify
the detector recovers its exact location through predict + NMS.

The loss-only overfit test (tests/test_train_step.py) can pass while
localization is broken; this script closes that gap. The tiny graph
recovers the box to ~1 px in ~2000 steps on CPU:

    expected [35, 13, 55, 38]  ->  got [34.8, 13.7, 54.3, 38.4] @ conf 0.91

Note: the flagship cfg is a poor overfit subject — DER blocks carry 24
Dropout(0.2) layers (reference parity), which drags tiny-data memorization.

Usage: python tools/overfit_check.py
"""
import jax, numpy as np
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rep_yolo_tpu.models.model import RepYOLO
from rep_yolo_tpu.train.loss import LossConfig
from rep_yolo_tpu.train import optim as optim_lib
from rep_yolo_tpu.train.trainer import create_train_state, make_train_step
from rep_yolo_tpu.ops.nms import non_max_suppression, detections_to_numpy

S, BSZ, M, STEPS = 64, 2, 8, 2000
model = RepYOLO.from_config("cfg/rep_yolo_tiny_test.yaml")
variables = model.init(jax.random.PRNGKey(0), img_size=S)
loss_cfg = LossConfig(nc=1)
opt_cfg = optim_lib.OptimConfig(lr0=0.01, epochs=STEPS, nb=1)
step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, S, use_ota=True),
               donate_argnums=(0,))
state = create_train_state(variables, jax.random.PRNGKey(1))

rng = np.random.default_rng(0)
imgs = np.full((BSZ, S, S, 3), 0.3 * 255, np.float32)  # 0-255 loader contract
# draw a bright box at (0.7, 0.4) size (0.3, 0.4) -> pixels x 35..55, y 13..38
for b in range(BSZ):
    imgs[b, 13:38, 35:55] = 255.0
labels = np.zeros((BSZ, M, 5), np.float32)
labels[:, 0] = [0, 0.7, 0.4, 0.3, 0.4]
mask = np.zeros((BSZ, M), bool); mask[:, 0] = True
imgs, hw = jnp.asarray(imgs), jnp.full((BSZ, 2), S, jnp.float32)
labels, mask = jnp.asarray(labels), jnp.asarray(mask)

for i in range(STEPS):
    state, comps = step(state, imgs, hw, labels, mask)
    if i % 500 == 0:
        print(f"step {i}: loss {float(comps['total']):.4f}")

raw = {"params": state.params, "batch_stats": state.batch_stats}
pred = model.predict(raw, imgs / 255.0)  # predict takes eval-contract 0-1
det = detections_to_numpy(non_max_suppression(pred, 0.25, 0.45, max_nms=256))[0]
print("dets img0 (expect center ~ (44.8, 25.6), box ~[35,13,55,38]):")
print(det[:4])
