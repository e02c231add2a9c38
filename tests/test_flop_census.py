"""Pin the StableHLO conv-FLOP parser behind tools/flop_census.py (the
independent cross-check of bench._analytic_generator_flops)."""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools.flop_census import census  # noqa: E402

SNIPPET = """
  %3 = stablehlo.convolution(%1, %2) dim_numbers = [b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f],
    window = {stride = [1, 1], pad = [[1, 1], [1, 1]]}
    : (tensor<16x256x192x12xbf16>, tensor<3x3x12x64xbf16>) -> tensor<16x256x192x64xbf16>
  %7 = stablehlo.add %3, %3 : tensor<16x256x192x64xbf16>
  %9 = stablehlo.convolution(%7, %8) dim_numbers = [b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f],
    window = {stride = [1, 1]} : (tensor<2x8x8x4xf32>, tensor<1x1x4x8xf32>) -> tensor<2x8x8x8xf32>
"""


def test_census_counts_conv_flops_exactly():
    total, by_shape = census(SNIPPET)
    conv1 = 2.0 * (16 * 256 * 192 * 64) * (3 * 3 * 12)
    conv2 = 2.0 * (2 * 8 * 8 * 8) * (1 * 1 * 4)
    assert total == conv1 + conv2
    assert len(by_shape) == 2
    key1 = "conv 3x3x12x64 -> 16x256x192x64 [bf16]"
    assert by_shape[key1] == [1, conv1]


def test_census_ignores_non_conv_ops():
    total, by_shape = census("stablehlo.dot_general ... : (tensor<4x4xf32>, "
                             "tensor<4x4xf32>) -> tensor<4x4xf32>")
    assert total == 0.0 and not by_shape
