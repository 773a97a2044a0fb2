"""Matmul-precision policy pins (the round-5 platform-gap fix must not
silently regress): fp32 frontend configs trace at HIGHEST, bf16 keeps the
fast default, and the geometry-path decorator activates the context."""

import jax
import pytest

from macvo_tpu.modules.frontend_network import _FlowFormerRunner
from macvo_tpu.utils.precision import matmul_highest
from macvo_tpu.utils.config import build_dynamic_config


def _runner(enc, dec, **extra):
    cfg, _ = build_dynamic_config({
        "weight": "random:0", "enc_dtype": enc, "dec_dtype": dec,
        "decoder_depth": 1, **extra})
    return _FlowFormerRunner(cfg)


def test_fp32_defaults_to_highest():
    assert _runner("fp32", "fp32").matmul_precision == "highest"


@pytest.mark.parametrize("enc,dec", [("bf16", "bf16"), ("fp32", "bf16"),
                                     ("bf16", "fp32")])
def test_mixed_and_bf16_keep_fast_default(enc, dec):
    assert _runner(enc, dec).matmul_precision == "default"


def test_explicit_override_wins():
    assert _runner("fp32", "fp32", matmul_precision="default").matmul_precision == "default"
    assert _runner("bf16", "bf16", matmul_precision="highest").matmul_precision == "highest"


def test_matmul_highest_context_active_at_trace_time():
    seen = {}

    @matmul_highest
    def fn(x):
        seen["precision"] = jax.config.jax_default_matmul_precision
        return x * 2

    jax.jit(fn)(jax.numpy.ones((2, 2)))
    assert seen["precision"] == "highest"
