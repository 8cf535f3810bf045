"""Tests for the padded-HBM-traffic analyzer (utils/hlo_traffic.py).

Golden-tests the tile math against hand-computed TPU layouts, the parser
against a synthetic optimized-HLO module, and round-trips a real compiled
jax program (CPU layouts are untiled there, so padded == logical — the
parser itself is what's exercised).
"""

import jax
import jax.numpy as jnp
import pytest

from ai_based_frame_interpolation_tpu.utils.hlo_traffic import (
    analyze_compiled, analyze_hlo_text, padded_shape_bytes)


class TestPaddedShapeBytes:
    def test_untiled_is_logical(self):
        assert padded_shape_bytes("f32", [2, 3, 4], "2,1,0") == 2 * 3 * 4 * 4

    def test_f32_lane_padding(self):
        # minor dim 8 -> 128 lanes, second-minor 16 -> multiple of 8 already
        assert padded_shape_bytes("f32", [2, 16, 16, 8],
                                  "3,2,1,0:T(8,128)") == 2 * 16 * 16 * 128 * 4

    def test_bf16_sublane_packing(self):
        # bf16 packs 2 sublanes: second-minor rounds to 16, minor to 128
        got = padded_shape_bytes("bf16", [2, 16, 13, 8],
                                 "3,2,1,0:T(8,128)(2,1)")
        assert got == 2 * 16 * 16 * 128 * 2

    def test_int8_packing(self):
        # int8 packs 4: second-minor rounds to 32
        got = padded_shape_bytes("s8", [1, 1, 17, 130],
                                 "3,2,1,0:T(8,128)(4,1)")
        assert got == 1 * 1 * 32 * 256

    def test_minor_to_major_order_respected(self):
        # layout {0,1}: dim0 is minor-most -> dim0 pads to 128, dim1 to 8
        got = padded_shape_bytes("f32", [5, 3], "0,1:T(8,128)")
        assert got == 8 * 128 * 4

    def test_scalar_and_empty(self):
        assert padded_shape_bytes("f32", [], None) == 4
        assert padded_shape_bytes("f32", [0, 4], "1,0:T(8,128)") == 0

    def test_1d_tile(self):
        assert padded_shape_bytes("f32", [100], "0:T(256)") == 256 * 4


SYNTH = """\
HloModule jit_step, is_scheduled=true

%fused_computation (p0: bf16[8,8,8,8]) -> bf16[8,8,8,8] {
  %p0 = bf16[8,8,8,8]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  ROOT %neg = bf16[8,8,8,8]{3,2,1,0:T(8,128)(2,1)} negate(%p0)
}

ENTRY %main.42 (a.1: bf16[8,8,8,8], w.1: bf16[3,3,8,16]) -> bf16[8,8,8,16] {
  %a.1 = bf16[8,8,8,8]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %w.1 = bf16[3,3,8,16]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %fusion.1 = bf16[8,8,8,8]{3,2,1,0:T(8,128)(2,1)} fusion(%a.1), kind=kLoop, calls=%fused_computation, metadata={op_name="jit(step)/neg"}
  ROOT %convolution.9 = bf16[8,8,8,16]{3,2,1,0:T(8,128)(2,1)} convolution(%fusion.1, %w.1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(step)/conv"}
}
"""


class TestAnalyzeHloText:
    def test_synthetic_module(self):
        r = analyze_hlo_text(SYNTH)
        # bf16 tiles (16,128): act [8,8,8,8] -> 8*8*16*128 elements
        act = 8 * 8 * 16 * 128 * 2
        w = 3 * 3 * 16 * 128 * 2
        out = 8 * 8 * 16 * 128 * 2
        # fusion: out act + read a.1 (act); conv: out + fusion + w
        assert r["total_bytes"] == (act + act) + (out + act + w)
        assert set(r["by_opcode"]) == {"fusion", "convolution"}
        assert r["pad_factor"] > 7          # C=8/16 vs 128 lanes
        # fused-computation interior must NOT be counted
        assert all(row["opcode"] != "negate" for row in r["top"])
        # attribution metadata captured
        assert any("conv" in row["op"] for row in r["top"])

    def test_tuple_output_fusion(self):
        hlo = """\
ENTRY %main (a: f32[8,128]) -> f32[8,128] {
  %a = f32[8,128]{1,0:T(8,128)} parameter(0)
  %f = (f32[8,128]{1,0:T(8,128)}, f32[8,130]{1,0:T(8,128)}) fusion(%a), kind=kLoop, calls=%fc
  %gte = f32[8,130]{1,0:T(8,128)} get-tuple-element(%f), index=1
  ROOT %e = f32[8,128]{1,0:T(8,128)} exponential(%gte)
}
"""
        r = analyze_hlo_text(hlo)
        base = 8 * 128 * 4
        padded130 = 8 * 256 * 4       # 130 lanes -> 256
        # fusion: outputs (base + padded130) + operand base;
        # exponential: out base + operand (gte shape) padded130
        assert r["total_bytes"] == (base + padded130 + base) \
            + (base + padded130)

    def test_real_compiled_program(self):
        def f(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.tanh(y) + x[..., :1]

        x = jnp.zeros((2, 16, 16, 8), jnp.bfloat16)
        w = jnp.zeros((3, 3, 8, 8), jnp.bfloat16)
        c = jax.jit(f).lower(x, w).compile()
        r = analyze_compiled(c)
        assert r is not None
        assert r["total_bytes"] >= r["total_bytes_logical"] > 0
        # the conv itself must be attributed (as convolution or a fusion)
        assert r["top"], r


MXU_SYNTH = """\
HloModule jit_step, is_scheduled=true

%fused_body (p0: bf16[8,32,32,16], p1: bf16[3,3,16,64]) -> bf16[8,32,32,64] {
  %p0 = bf16[8,32,32,16]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %p1 = bf16[3,3,16,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %conv.1 = bf16[8,32,32,64]{3,2,1,0:T(8,128)(2,1)} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(f)/conv_general_dilated"}
}

ENTRY %main (a: bf16[8,32,32,16], w: bf16[3,3,16,64], m: bf16[8,32,16,64]) -> bf16[256,8,32,64] {
  %a = bf16[8,32,32,16]{3,2,1,0:T(8,128)(2,1)} parameter(0)
  %w = bf16[3,3,16,64]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  %m = bf16[8,32,16,64]{3,2,1,0:T(8,128)(2,1)} parameter(2)
  %fusion.2 = bf16[8,32,32,64]{3,2,1,0:T(8,128)(2,1)} fusion(%a, %w), kind=kOutput, calls=%fused_body, metadata={op_name="jit(f)/conv_general_dilated"}
  ROOT %convolution.7 = bf16[256,8,32,64]{3,2,1,0:T(8,128)(2,1)} convolution(%fusion.2, %m), window={size=8x32 pad=7_7x31_31 rhs_reversal=1x1}, dim_labels=fb01_01io->b01f, metadata={op_name="jit(f)/bhwc,wo->bhoc/dot_general"}
}
"""


class TestAnalyzeMxu:
    def test_conv_in_fusion_body_and_trick_dot(self):
        """TPU HLO puts convs inside fusion bodies, and lowers some
        dot_generals AS convolutions (huge window + rhs_reversal); the
        analyzer must find the former and not overcount the latter."""
        from ai_based_frame_interpolation_tpu.utils.hlo_traffic import \
            analyze_mxu

        r = analyze_mxu(MXU_SYNTH)
        assert r["n_ops"] == 2
        by_name = {o["name"]: o for o in r["ops"]}
        conv = by_name["conv.1"]
        assert conv["K"] == 3 * 3 * 16 and conv["N"] == 64
        assert conv["M"] == 8 * 32 * 32
        # flops exact: 2 * out_elems * K
        assert conv["gflops"] == round(2 * 8 * 32 * 32 * 64 * 144 / 1e9, 2)
        # eff = K_fill(144 -> 2 tiles of 128) * N_fill(64/128)
        assert abs(conv["eff"] - (144 / 256) * (64 / 128)) < 1e-3
        trick = by_name["convolution.7"]
        # op_name says dot_general: the window taps are an artifact, only
        # the cin=16 channel contraction does real MACs
        assert trick["K"] == 16
        assert trick["gflops"] == round(
            2 * 256 * 8 * 32 * 64 * 16 / 1e9, 2)
        assert 0 < r["utilization"] <= 1.0

    def test_utilization_on_real_program(self):
        from ai_based_frame_interpolation_tpu.utils.hlo_traffic import \
            analyze_mxu

        def f(x, w, w2):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.relu(y)
            return jax.lax.conv_general_dilated(
                y, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        x = jnp.zeros((2, 16, 16, 16), jnp.bfloat16)
        w = jnp.zeros((3, 3, 16, 64), jnp.bfloat16)
        w2 = jnp.zeros((3, 3, 64, 64), jnp.bfloat16)
        r = analyze_mxu(jax.jit(f).lower(x, w, w2).compile().as_text())
        assert r["n_ops"] == 2
        # conv2: K=576 -> 576/640; N=64 -> 0.5; conv1: 144/256 * 0.5
        effs = sorted(o["eff"] for o in r["ops"])
        assert abs(effs[0] - (144 / 256) * 0.5) < 1e-3
        assert abs(effs[1] - (576 / 640) * 0.5) < 1e-3
