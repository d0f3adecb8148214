"""Plan-level tests of the channel-major q8 region planner.

The planner (models/network.py, DetectionNet.__call__) decides at trace
time which backbone layers exchange flat (B, C, H*W) int8. These tests
run the FLAGSHIP 640px config through `jax.eval_shape` (no FLOPs, no
TPU) and assert on the published plan (network.LAST_REGION_PLAN):

- the stem enters the region and the stem->l1->MP->l3 span forms with
  the default c1<=64 gate;
- a deliberately missing calibration scale produces a visible warning
  and a visible plan change, never a silent region exit (round-3 weak
  item: a missing scale used to silently cost ~10% throughput with no
  symptom).
"""

import logging

import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

import rep_yolo_tpu.nn.blocks as B
from rep_yolo_tpu.models import network as net_lib
from rep_yolo_tpu.models.model import RepYOLO
from rep_yolo_tpu.nn.blocks import ConvUnit


@pytest.fixture(scope="module")
def flagship():
    model = RepYOLO.from_config("cfg/rep_yolo.yaml", deploy=True)
    x = jax.ShapeDtypeStruct((1, 640, 640, 3), jnp.float32)

    def fwd(xs):
        v = model.net.init({"params": jax.random.PRNGKey(0)}, xs,
                           train=False)
        return model.net.apply(v, xs, train=False)

    # collect every ConvUnit scope path abstractly (what quant.calibrate
    # would produce keys for), without running any real compute
    paths: list[str] = []

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (isinstance(m, ConvUnit) and context.method_name == "__call__"
                and m.scope is not None):
            paths.append("/".join(m.scope.path))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(fwd, x)
    assert paths, "no ConvUnit paths collected"
    return model, fwd, x, {p: 0.01 for p in paths}


def _plan_with(flagship, scales):
    model, fwd, x, _ = flagship
    try:
        B.set_cmajor_deploy("q8", scales)   # default gate: c1 <= 64
        # fresh closure: eval_shape caches traces per function object,
        # and the region planner is trace-time state
        jax.eval_shape(lambda xs: fwd(xs), x)
        return dict(net_lib.LAST_REGION_PLAN)
    finally:
        B.set_cmajor_deploy(None)


def test_flagship_region_spans_stem_to_l5(flagship):
    plan = _plan_with(flagship, flagship[3])
    # l0 stem enters the region and emits int8 for l1
    assert plan[0].startswith("region entry"), plan[0]
    assert "st1(l1)" in plan[0]
    # l1 consumes int8 and stays in-region, emitting for l3
    assert plan[1].startswith("in-region DER"), plan[1]
    assert "int8 in" in plan[1] and "st1(l3)" in plan[1]
    # the MPs between stay in-region: either a standalone flat int8
    # pool or (round 4) fused into the producing DER's cv1 epilogue
    for mp in (2, 4):
        assert plan[mp] in ("in-region flat int8 pool",
                            "MP fused into producer cv1 epilogue"), plan[mp]
    # l3 chains into l5 (default gate c1 <= 128, round-4 sweep)
    assert "int8 in" in plan[3] and "st1(l5)" in plan[3], plan[3]
    # l5 consumes int8 and exits NHWC (l7 c1=256 is out of the gate:
    # its 3x3 256->256 @40x40 int8 measured slower than XLA bf16)
    assert "int8 in" in plan[5], plan[5]
    assert "st1(l7)" not in plan[5], plan[5]
    assert "select gate or calibration declined" in plan.get(7, ""), plan.get(7)


def test_missing_scale_warns_not_silent(flagship, caplog):
    scales = dict(flagship[3])
    # break l3's st1 calibration: the planner must say so out loud
    missing = [k for k in scales if k.endswith("l3/stage1/reparam_conv")]
    assert missing, sorted(scales)[:8]
    for k in missing:
        del scales[k]
    with caplog.at_level(logging.WARNING,
                         logger="rep_yolo_tpu.models.network"):
        plan = _plan_with(flagship, scales)
    assert any("no st1 calibration scale" in r.message
               for r in caplog.records), [r.message for r in caplog.records]
    # and the plan visibly shows l1 exiting instead of chaining into l3
    assert "st1(l3)" not in plan[1], plan[1]
