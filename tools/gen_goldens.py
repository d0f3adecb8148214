"""Generate golden parity fixtures from the PyTorch reference (offline tool).

Runs the reference Rep-YOLO model (read-only at /root/reference) on CPU with
fixed seeds, randomized BN running stats (so BN folding is non-trivially
tested), and saves:

- tests/golden/model_weights.npz   — full torch state_dict
- tests/golden/model_io.npz        — input (NCHW), eval decoded output,
                                     raw train-mode maps, fused-model output
- tests/golden/block_<name>.npz    — per-block state + input/output pairs

These fixtures are consumed by tests/test_golden_*.py WITHOUT needing torch
or the reference tree. Regenerate with:
    python tools/gen_goldens.py
"""

from __future__ import annotations

import copy
import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
REF = Path("/root/reference")


def _stub_missing_modules():
    """Stub optional deps the reference imports at module scope."""
    import torch.nn as nn

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        class DeformConv2d(nn.Module):  # imported but unused by Rep-YOLO
            pass

        def nms(*a, **k):
            raise NotImplementedError

        ops.DeformConv2d = DeformConv2d
        ops.nms = nms
        ops.roi_pool = ops.roi_align = ops.ps_roi_pool = ops.ps_roi_align = nms
        utils_mod = types.ModuleType("torchvision.utils")
        utils_mod.save_image = nms
        transforms = types.ModuleType("torchvision.transforms")
        transforms.ToTensor = object
        tv.ops = ops
        tv.utils = utils_mod
        tv.transforms = transforms
        tv.__path__ = []  # mark as package
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.utils"] = utils_mod
        sys.modules["torchvision.transforms"] = transforms
    for name in ("requests", "seaborn", "wandb"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)


def _randomize_bn_stats(model, gen):
    import torch

    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            # production BN hyperparams (reference utils/torch_utils.py:149-151
            # initialize_weights sets these on the full model; apply to
            # standalone blocks too so fixtures match production behavior)
            m.eps = 1e-3
            m.momentum = 0.03
            m.running_mean.copy_(0.3 * torch.randn(
                m.running_mean.shape, generator=gen))
            m.running_var.copy_(0.5 + torch.rand(
                m.running_var.shape, generator=gen))


def _state_np(module) -> dict:
    return {k: v.detach().cpu().numpy().astype(np.float32)
            for k, v in module.state_dict().items()}


def gen_model():
    import torch

    sys.path.insert(0, str(REF))
    _stub_missing_modules()
    from models.yolo import Model  # noqa: the reference package

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1234)
    model = Model(str(REF / "cfg/training/Rep-YOLO.yaml"), ch=3, nc=1)
    model.eval()
    _randomize_bn_stats(model, gen)
    # give implicits non-trivial values (they are ~N(0/1, .02) already)

    x = torch.rand((1, 3, 256, 256), generator=gen)
    with torch.no_grad():
        z, raw = model(x)  # eval: (decoded (1,N,6), raw maps)
        model_train = copy.deepcopy(model)
        model_train.train()
        # fused/deploy path
        fused = copy.deepcopy(model).fuse().eval()
        zf, rawf = fused(x)

    np.savez(GOLDEN / "model_weights.npz", **_state_np(model))
    np.savez(
        GOLDEN / "model_io.npz",
        x=x.numpy(),
        z=z.numpy(),
        zf=zf.numpy(),
        **{f"raw{i}": r.detach().numpy() for i, r in enumerate(raw)},
        strides=model.model[-1].stride.numpy(),
        anchor_grid=model.model[-1].anchor_grid.numpy(),
        anchors_norm=model.model[-1].anchors.numpy(),
    )
    n_params = sum(p.numel() for p in model.parameters())
    print(f"model goldens written; reference params = {n_params}")


def gen_blocks():
    import torch

    sys.path.insert(0, str(REF))
    _stub_missing_modules()
    from models import common as C

    gen = torch.Generator().manual_seed(99)

    def run(name, module, cin, hw=32, train_also=False):
        torch.manual_seed(7)
        module.eval()
        _randomize_bn_stats(module, gen)
        x = torch.rand((2, cin, hw, hw), generator=gen)
        with torch.no_grad():
            y = module(x)
        out = {"x": x.numpy(), "y": y.numpy()}
        if train_also and hasattr(module, "reparameterize"):
            fused = copy.deepcopy(module)
            fused.reparameterize()
            with torch.no_grad():
                out["y_fused"] = fused(x).numpy()
        np.savez(GOLDEN / f"block_{name}.npz", **out, **_state_np(module))
        print(f"block_{name}: y{tuple(y.shape)}")

    run("conv", C.Conv(16, 32, 3, 2), 16)
    run("reps_s1", C.RepS_Block(32, 32, 3, 1, 1, num_conv_branches=1), 32,
        train_also=True)
    run("reps_s2", C.RepS_Block(16, 32, 3, 2, 1, num_conv_branches=1), 16,
        train_also=True)
    run("der", C.DER_Block(32, 64, 1, 2), 32)
    run("sppcspc", C.SPPCSPC(64, 64), 64)
    run("gsconv", C.GSConv(32, 64, 1, 1), 32)
    run("gsconv_s2", C.GSConv(32, 64, 3, 2), 32)
    run("vovgscsp", C.VoVGSCSP(64, 64), 64)
    run("ca", C.CA(64), 64)
    run("cca", C.CrissCrossAttention(64), 64, hw=16)
    run("va", C.VerticalAttention(64), 64, hw=16)
    run("ccva", C.CCVA(64, 64), 64, hw=16)
    run("repconv", C.RepConv(64, 64, 3, 1), 64)
    run("repconv_c2", C.RepConv(32, 64, 3, 1), 32)
    run("mp", C.MP(), 16)
    run("sp", C.SP(3, 1), 16)

    # RepConv fuse_repvgg_block golden
    torch.manual_seed(7)
    rc = C.RepConv(64, 64, 3, 1)
    rc.eval()
    _randomize_bn_stats(rc, gen)
    x = torch.rand((2, 64, 32, 32), generator=gen)
    state = _state_np(rc)
    with torch.no_grad():
        y_train = rc(x)
        rc.fuse_repvgg_block()
        y_fused = rc(x)
    np.savez(GOLDEN / "block_repconv_fuse.npz", x=x.numpy(),
             y=y_train.numpy(), y_fused=y_fused.numpy(), **state)
    print("block_repconv_fuse done")


def gen_losses():
    """Golden loss values: reference ComputeLoss / ComputeLossOTA on canned
    raw maps + targets, using the real built model for det attributes."""
    import torch

    sys.path.insert(0, str(REF))
    _stub_missing_modules()
    from models.yolo import Model
    from utils.loss import ComputeLoss, ComputeLossOTA

    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(777)
    model = Model(str(REF / "cfg/training/Rep-YOLO.yaml"), ch=3, nc=1)
    model.hyp = dict(box=0.05, obj=0.7, cls=0.3, cls_pw=1.0, obj_pw=1.0,
                     fl_gamma=0.0, anchor_t=4.0)
    model.gr = 1.0

    bs, size = 2, 128
    shapes = [size // 8, size // 16, size // 32]
    na, no = 3, 6
    p = [torch.randn((bs, na, s, s, no), generator=gen) * 2.0 for s in shapes]
    # targets (n, 6) [img, cls, x, y, w, h] normalized — sizes spread across
    # levels so every level gets candidates (the reference's empty-level
    # branch hardcodes device 'cuda:0', utils/loss.py:792)
    targets = torch.tensor([
        [0, 0, 0.30, 0.40, 0.10, 0.12],
        [0, 0, 0.70, 0.60, 0.30, 0.35],
        [0, 0, 0.52, 0.50, 0.60, 0.55],
        [1, 0, 0.25, 0.25, 0.08, 0.10],
        [1, 0, 0.75, 0.40, 0.25, 0.28],
        [1, 0, 0.45, 0.65, 0.55, 0.60],
    ], dtype=torch.float32)
    imgs = torch.zeros((bs, 3, size, size))

    closs = ComputeLoss(model)
    with torch.no_grad():
        loss, items = closs([pp.clone() for pp in p], targets.clone())
    ota = ComputeLossOTA(model)
    with torch.no_grad():
        loss_ota, items_ota = ota([pp.clone() for pp in p], targets.clone(),
                                  imgs)

    # aux: 2*nl maps [lead..., aux...]; ComputeLossAuxOTA only reads det
    # attrs (na/nc/nl/anchors/stride), which IDetect provides
    from utils.loss import ComputeLossAuxOTA

    p_aux = [pp.clone() for pp in p] + [
        torch.randn((bs, na, s, s, no), generator=gen) * 2.0 for s in shapes]
    aux = ComputeLossAuxOTA(model)
    with torch.no_grad():
        loss_aux, items_aux = aux([pp.clone() for pp in p_aux],
                                  targets.clone(), imgs)

    np.savez(
        GOLDEN / "loss_io.npz",
        **{f"p{i}": pp.numpy() for i, pp in enumerate(p)},
        **{f"paux{i}": pp.numpy() for i, pp in enumerate(p_aux)},
        targets=targets.numpy(),
        loss=loss.numpy(), items=items.numpy(),
        loss_ota=loss_ota.numpy(), items_ota=items_ota.numpy(),
        loss_aux=loss_aux.numpy(), items_aux=items_aux.numpy(),
        anchors_norm=model.model[-1].anchors.numpy(),
        strides=model.model[-1].stride.numpy(),
        img_size=np.asarray(size),
    )
    print(f"loss goldens: classic={items.tolist()} ota={items_ota.tolist()} "
          f"aux={items_aux.tolist()}")


if __name__ == "__main__":
    GOLDEN.mkdir(parents=True, exist_ok=True)
    gen_blocks()
    gen_model()
    gen_losses()
