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
        # ConvUnit + nn.Conv — the same coverage quant.calibrate records
        # (nn.Conv = the IDetect head 1x1s the neck region emits into)
        if (isinstance(m, (ConvUnit, nn.Conv))
                and context.method_name == "__call__"
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
    # l3 chains into l5
    assert "int8 in" in plan[3] and "st1(l5)" in plan[3], plan[3]
    # l5 chains into l7: the default gate is the whole backbone
    # (c1 <= 512) since the round-5 flat neck — keeping l7 in-region
    # deletes the l7-exit/l9-entry relayout pair and the interleaved
    # A/B flipped the round-4 verdict (BASELINE.md round-5 deep_gate)
    assert "int8 in" in plan[5] and "st1(l7)" in plan[5], plan[5]
    assert "int8 in" in plan.get(7, ""), plan.get(7)


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


def test_flagship_neck_region_plan(flagship):
    """Round-5 flat int8 neck region: the whole post-backbone graph runs
    in-region, with NHWC exits only at the 6 CA/CCVA/ADD attention
    sandwiches and re-entry quantizes after each island."""
    plan = _plan_with(flagship, flagship[3])
    # SPPCSPC enters the region from l8's NHWC output
    assert plan[9].startswith("neck entry quantize"), plan.get(9)
    assert "in-region SPPCSPC" in plan[9]
    # FPN/PAN spans stay flat: GSConv/VoVGSCSP/Upsample/Concat/MP
    for i in (10, 14, 15, 24, 31, 32, 33, 40, 47, 48, 49, 56):
        assert "in-region" in plan.get(i, ""), (i, plan.get(i))
    for i in (11, 16):
        assert plan.get(i) == "in-region flat upsample", plan.get(i)
    for i in (13, 18, 34, 50):
        assert plan.get(i) == "in-region concat (unmaterialized)", plan.get(i)
    for i in (30, 46):
        assert "in-region" in plan.get(i, "") and "pool" in plan[i], plan.get(i)
    # sandwich-entry convs exit NHWC for the bf16 attention islands
    for i in (19, 25, 35, 41, 51, 57):
        assert plan.get(i, "").endswith("NHWC exit"), (i, plan.get(i))
    # post-island convs re-enter with a quantize
    for i in (23, 29, 39, 45, 55, 61):
        assert plan.get(i, "").startswith("neck entry quantize"), (i, plan.get(i))
    # RepConv heads run flat and emit int8 at the IDetect conv scales
    for i in (62, 63, 64):
        assert plan.get(i) == "in-region RepConv -> int8", plan.get(i)


def test_neck_region_off_flag(flagship):
    """set_neck_q8(False) reverts to the round-4 backbone-only region."""
    try:
        B.set_neck_q8(False)
        plan = _plan_with(flagship, flagship[3])
    finally:
        B.set_neck_q8(True)
    assert not any("neck" in d or "in-region SPPCSPC" in d
                   for d in plan.values()), plan
    # backbone region unaffected
    assert plan[0].startswith("region entry"), plan[0]


def test_neck_missing_head_scale_degrades_gracefully(flagship):
    """A missing IDetect conv scale must only cost the RepConv exit
    (NHWC), never break the forward."""
    scales = {k: v for k, v in flagship[3].items()
              if not k.startswith("l65/m_")}
    plan = _plan_with(flagship, scales)
    for i in (62, 63, 64):
        assert plan.get(i, "").endswith("NHWC exit"), (i, plan.get(i))
