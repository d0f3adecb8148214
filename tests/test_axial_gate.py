"""Size gate for fused axial attention."""

import rep_yolo_tpu.nn.blocks as B


def test_size_gate():
    try:
        B.set_fused_attention(True, max_hw=1600)
        assert B._use_fused_attention(40, 40)
        assert B._use_fused_attention(20, 20)
        assert not B._use_fused_attention(80, 80)
        B.set_fused_attention(True)
        assert B._use_fused_attention(80, 80)
        B.set_fused_attention(False)
        assert not B._use_fused_attention(20, 20)
    finally:
        B.set_fused_attention(False)
