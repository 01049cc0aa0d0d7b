"""Tests for the eval-free metric parser and the pure-Python TB writer."""

import math
import os

from dr4sr_tpu.utils.parsing import parse_metric_line
from dr4sr_tpu.utils.tbwriter import SummaryWriter, _crc32c


def test_parse_plain_dict():
    assert parse_metric_line("{'ndcg@20': 0.042, 'recall@20': 0.1}") == {
        "ndcg@20": 0.042, "recall@20": 0.1,
    }


def test_parse_nan_inf():
    out = parse_metric_line("{'loss': nan, 'lr': inf, 'x': -inf, 'k': 1}")
    assert math.isnan(out["loss"])
    assert out["lr"] == float("inf")
    assert out["x"] == float("-inf")
    assert out["k"] == 1


def test_parse_rejects_expressions():
    # the round-2 eval() fallback would have executed these
    assert parse_metric_line("{'x': ().__class__.__mro__}") is None
    assert parse_metric_line("{'x': 1+1}") is None
    assert parse_metric_line("not a dict") is None
    assert parse_metric_line("{'msg': 'inf style info'}") == {
        "msg": "inf style info"
    }


def test_crc32c_vectors():
    # public test vectors (RFC 3720 appendix / crc32c reference impls)
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tbwriter_readable_by_tensorboard(tmp_path):
    """Events written by the first-party writer load in real TensorBoard."""
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("val/ndcg@20", 0.0444, step=3)
    w.add_scalar("train/loss", 1.5, step=3)
    w.close()

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(files) == 1
    events = list(EventFileLoader(str(tmp_path / files[0])).Load())
    assert events[0].file_version == "brain.Event:2"
    # EventFileLoader migrates simple_value -> scalar tensor (data_compat)
    scalars = {
        v.tag: (e.step,
                v.tensor.float_val[0] if v.tensor.float_val else v.simple_value)
        for e in events[1:] for v in e.summary.value
    }
    assert scalars["val/ndcg@20"][0] == 3
    assert abs(scalars["val/ndcg@20"][1] - 0.0444) < 1e-6
    assert abs(scalars["train/loss"][1] - 1.5) < 1e-6


def test_rng_impl_knob():
    """train.rng_impl switches the default PRNG (rbg = TPU-cheap dropout
    keys; results_stress_decompose.json measured -42%% stress step time)."""
    import jax

    from dr4sr_tpu.utils.env import setup_environment

    try:
        setup_environment({"seed": 1, "no_compile_cache": True,
                           "rng_impl": "rbg"})
        assert jax.random.PRNGKey(0).shape == (4,)  # rbg keys are 4x uint32
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert jax.random.PRNGKey(0).shape == (2,)
