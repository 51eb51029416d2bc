"""Wide (SIMD-across-lanes) JPEG codec vs the scalar T.81 oracle.

The scalar implementation in sources/codecs.py is spec-derived
(ITU-T T.81 baseline) and separately pinned by tests/test_codecs.py;
this file pins jpegwide's batched decoder/encoder BIT/BYTE-identical
to it across sizes, color/gray, restart intervals, and table mixes —
plus the validation contract (corrupt streams must raise, not
silently emit pixels).
"""

import numpy as np
import pytest

from geotools_ray.sources import codecs
from geotools_ray.sources import jpegwide as jw


def _noise(rng, h, w, gray=False):
    shape = (h, w) if gray else (h, w, 3)
    return rng.randint(0, 256, size=shape).astype(np.uint8)


def _smooth(rng, h, w):
    base = np.linspace(0, 255, w)[None, :, None]
    px = base + rng.normal(0, 12, (h, w, 3))
    return px.clip(0, 255).astype(np.uint8)


def test_decode_batch_bit_identical_mixed():
    """Mixed sizes, gray+color, restart+no-restart, two quant tables —
    one batch, every output bit-identical to the scalar decoder."""
    rng = np.random.RandomState(11)
    payloads = []
    for i in range(14):
        h, w = int(rng.randint(8, 70)), int(rng.randint(8, 70))
        gray = i % 4 == 0
        px = _noise(rng, h, w, gray) if i % 2 else _smooth(rng, h, w)
        if gray and px.ndim == 3:
            px = px[..., 0]
        q = (85, 92, 98)[i % 3]
        ri = (0, 3, 8)[i % 3]
        payloads.append(codecs.encode_jpeg(px, quality=q, restart_interval=ri))
    wide = jw.decode_jpeg_batch(payloads)
    for p, got in zip(payloads, wide):
        assert np.array_equal(got, codecs.decode_jpeg(p))


def test_decode_batch_empty_and_single():
    assert jw.decode_jpeg_batch([]) == []
    rng = np.random.RandomState(3)
    p = codecs.encode_jpeg(_smooth(rng, 24, 40), quality=90)
    (got,) = jw.decode_jpeg_batch([p])
    assert np.array_equal(got, codecs.decode_jpeg(p))


def test_encode_stack_byte_identical():
    """Stack encode == scalar encode per image, color and gray, with
    and without restart markers."""
    rng = np.random.RandomState(5)
    for gray in (False, True):
        for ri in (0, 4):
            if gray:
                stack = np.stack([_noise(rng, 40, 56, True) for _ in range(6)])
            else:
                stack = np.stack([_smooth(rng, 40, 56) for _ in range(6)])
            wide = jw.encode_jpeg_stack(stack, quality=88, restart_interval=ri)
            for px, got in zip(stack, wide):
                assert got == codecs.encode_jpeg(px, quality=88, restart_interval=ri)


def test_encode_stack_nonmultiple_of_8():
    """Edge-padded partial blocks match the scalar encoder exactly."""
    rng = np.random.RandomState(9)
    stack = np.stack([_smooth(rng, 19, 27) for _ in range(4)])
    wide = jw.encode_jpeg_stack(stack, quality=92, restart_interval=2)
    for px, got in zip(stack, wide):
        assert got == codecs.encode_jpeg(px, quality=92, restart_interval=2)


def test_encode_stack_empty():
    assert jw.encode_jpeg_stack(np.zeros((0, 8, 8, 3), np.uint8), 90) == []


def test_scalar_restart_roundtrip_psnr():
    """The restart-interval encoder stays decodable by BOTH decoders
    and holds the lossy-fidelity gate on smooth content."""
    rng = np.random.RandomState(21)
    base = np.linspace(0, 255, 48)[None, :, None]
    px = (base + rng.normal(0, 1.5, (48, 48, 3))).clip(0, 255).astype(np.uint8)
    p = codecs.encode_jpeg(px, quality=92, restart_interval=8)
    out_s = codecs.decode_jpeg(p)
    (out_w,) = jw.decode_jpeg_batch([p])
    assert np.array_equal(out_s, out_w)
    mse = np.mean((out_s.astype(np.float64) - px) ** 2)
    assert 10 * np.log10(255.0**2 / mse) >= 40.0


def test_decode_rejects_truncated_stream():
    rng = np.random.RandomState(2)
    p = codecs.encode_jpeg(_noise(rng, 32, 32), quality=92, restart_interval=4)
    # chop entropy bytes out of the middle, keep the EOI marker
    bad = p[: len(p) - 40] + p[-2:]
    with pytest.raises(ValueError):
        jw.decode_jpeg_batch([bad])


def test_decode_rejects_wrong_segment_count():
    rng = np.random.RandomState(2)
    p = codecs.encode_jpeg(_noise(rng, 32, 32), quality=92, restart_interval=4)
    # strip one RST marker: segment count no longer matches DRI math
    i = p.find(b"\xff\xd0")
    assert i > 0
    bad = p[:i] + p[i + 2 :]
    with pytest.raises(ValueError):
        jw.decode_jpeg_batch([bad])


def test_decode_one_bad_image_names_it():
    """A corrupt stream rejects the batch with the failing index —
    never silently corrupts its neighbours."""
    rng = np.random.RandomState(7)
    good = codecs.encode_jpeg(_smooth(rng, 24, 24), quality=90)
    p = codecs.encode_jpeg(_noise(rng, 32, 32), quality=92)
    bad = p[:-30] + p[-2:]
    with pytest.raises(ValueError, match="1"):
        jw.decode_jpeg_batch([good, bad])


def test_decode_not_a_jpeg():
    with pytest.raises(ValueError):
        jw.decode_jpeg_batch([b"\x89PNG____not_a_jpeg"])
