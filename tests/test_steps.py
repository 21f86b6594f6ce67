"""Step-pipeline parity: every intermediate matches the reference bitwise.

Runs the reference's step chain and ours side by side in both directions,
asserting equality of every intermediate array/list/bytes (x64 parity mode).
"""
import warnings

import numpy as np
import pytest

from tests import reference_oracle

from jpeg_tpu import Configuration, QuantizationMethod, compress_band, steps

pytestmark = pytest.mark.skipif(not reference_oracle.available(),
                                reason="reference repo not present")

CONFIGS = [
    (16, 8, 2, 8, "DCT", None),
    (37, 23, 5, 8, "DCT", ("qtable", {})),
    (20, 10, 3, 4, "DCT", ("divide", {"divisor": 40})),
    (16, 8, 2, 4, "DCT", ("discard", {"keep": 2})),
    (16, 8, 3, 8, "DFT", None),
    (24, 16, 2, 8, "DFT", ("divide", {"divisor": 40})),
]


def _pair(w, h, bs, d, tr, q):
    ref = reference_oracle.load()
    qr = ref.pipeline.QuantizationMethod(q[0], **q[1]) if q else None
    qo = QuantizationMethod(q[0], **q[1]) if q else None
    rcfg = ref.pipeline.Configuration(width=w, height=h, block_size=bs,
                                      dct_size=d, transform=tr,
                                      quantization=qr)
    ocfg = Configuration(width=w, height=h, block_size=bs, dct_size=d,
                         transform=tr, quantization=qo)
    return ref, rcfg, ocfg


def _assert_same(ours, theirs, stage):
    if isinstance(theirs, (bytes, bytearray)):
        assert bytes(ours) == bytes(theirs), stage
    elif isinstance(theirs, list):
        assert list(ours) == list(theirs), stage
    else:
        a, b = np.asarray(ours), np.asarray(theirs)
        assert a.shape == b.shape, f"{stage}: {a.shape} vs {b.shape}"
        np.testing.assert_array_equal(a, b, err_msg=stage)


@pytest.mark.parametrize("w,h,bs,d,tr,q", CONFIGS)
def test_stepwise_forward_and_inverse_parity(w, h, bs, d, tr, q):
    ref, rcfg, ocfg = _pair(w, h, bs, d, tr, q)
    ref_steps = [cls(rcfg) for cls in ref.pipeline.base.step_classes]
    our_steps = [cls(ocfg) for cls in steps.step_classes]
    assert len(ref_steps) == len(our_steps) == 9
    assert [s.step_index for s in our_steps] == list(range(9))

    rng = np.random.default_rng(12345)
    a_ref = rng.integers(0, 256, size=(h, w)).astype(np.int64)
    a_our = a_ref.copy()

    inters = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for rs, os_ in zip(ref_steps, our_steps):
            a_ref = rs.execute(a_ref)
            a_our = os_.execute(a_our)
            _assert_same(a_our, a_ref, f"execute[{os_.step_index}]")
            inters.append(a_ref)

        for rs, os_ in zip(reversed(ref_steps), reversed(our_steps)):
            a_ref = rs.invert(np.asarray(a_ref) if not isinstance(
                a_ref, (bytes, list)) else a_ref)
            a_our = os_.invert(a_our)
            _assert_same(a_our, a_ref, f"invert[{os_.step_index}]")


def test_steps_pipeline_equals_fused_pipeline():
    cfg = Configuration(width=37, height=23, block_size=5, dct_size=8,
                        quantization=QuantizationMethod("qtable"))
    rng = np.random.default_rng(77)
    a = rng.integers(0, 256, size=(23, 37)).astype(np.int64)
    assert steps.compress_band_steps(a, cfg) == compress_band(a, cfg)


def test_missing_step_index_raises():
    with pytest.raises(steps.MissingStepIndexError):
        class Broken(steps.AlgorithmStep):  # noqa: F841
            pass


def test_custom_step_registers_sorted():
    before = list(steps.step_classes)
    try:
        class Custom(steps.AlgorithmStep):
            step_index = 2.5

            def execute(self, array):
                return array

            def invert(self, array):
                return array

        idx = steps.step_classes.index(Custom)
        assert steps.step_classes[idx - 1].step_index == 2
        assert steps.step_classes[idx + 1].step_index == 3
    finally:
        steps.step_classes[:] = before
