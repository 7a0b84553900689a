"""Baseline JPEG codec: round-trip fidelity at both samplings, edge
dimensions, magnitude-coding inverses, feature-stage integration, and
loud rejection of unsupported coding processes."""

import numpy as np
import pyarrow as pa
import pytest

from nifi_processors_ray.stages.jpeg import (_extend, _magnitude,
                                             decode_jpeg, encode_jpeg)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 255) // max(1, w - 1),
                     (yy * 255) // max(1, h - 1),
                     ((xx + yy) * 4) % 256], axis=-1).astype(np.uint8)


def test_magnitude_extend_inverse():
    for v in list(range(-300, 301)) + [-32767, 32767]:
        cat, bits = _magnitude(v)
        assert _extend(bits, cat) == v


@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_gradient(sub):
    img = _gradient(24, 32)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth gradients survive q=95 nearly losslessly (chroma subsampling
    # adds a couple of counts at color edges)
    assert err.max() <= (4 if sub == "444" else 12)
    assert err.mean() < 3.0


@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_odd_dimensions(sub):
    # dims not multiples of 8 (nor of the 16-px 4:2:0 MCU)
    img = _gradient(17, 19)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert out.shape == (17, 19, 3)


def test_uniform_image_exact():
    flat = np.full((12, 20, 3), 130, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=85))
    assert np.array_equal(out, flat)


def test_gray_input_expands():
    g = (np.arange(24 * 32).reshape(24, 32) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (24, 32, 3)


def test_rejects_non_baseline():
    img = _gradient(8, 8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_dispatch_and_feature_stage():
    from nifi_processors_ray.stages.multimodal import (ImageFeatureStage,
                                                       decode_image,
                                                       synthesize_jpeg_media)

    media = synthesize_jpeg_media(6, width=16, height=12)
    img = decode_image(media["payload"][0].as_py())
    assert img.shape == (12, 16, 3)
    out = ImageFeatureStage()(media)
    assert out["decoded_width"].to_pylist() == [16] * 6
    assert out["decoded_height"].to_pylist() == [12] * 6
    feats = np.array(out["features"].to_pylist())
    assert feats.shape == (6, ImageFeatureStage.FEATURE_DIM)
    # lossy but close: decoded channel means track the lossless gradient
    from nifi_processors_ray.stages.multimodal import synthesize_ppm_media

    ppm = ImageFeatureStage()(synthesize_ppm_media(6, width=16, height=12))
    ref = np.array(ppm["features"].to_pylist())
    # the synthetic gradients wrap (%256) so JPEG ringing moves stds a bit
    # more than means; both stay near the lossless reference
    assert np.abs(feats[:, :3] - ref[:, :3]).max() < 0.05   # channel means
    assert np.abs(feats[:, 3:6] - ref[:, 3:6]).max() < 0.12  # channel stds


def test_payload_determinism():
    from nifi_processors_ray.stages.multimodal import synthesize_jpeg_media

    t1 = synthesize_jpeg_media(4)
    t2 = synthesize_jpeg_media(4)
    assert t1.equals(t2)
