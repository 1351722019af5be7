"""The pure-Python PPM (P6) codec that closes the multimodal decode
seam: encode -> decode must be the identity on (width, height, rgb),
and the decoder must parse real-world header variants (comments,
multi-digit dims) and reject what it cannot decode rather than
returning garbage."""

import pytest

from formula1_etl_analytics_project_spark.operators.multimodal import (
    _decode_image,
    decode_ppm,
    encode_ppm,
)


def test_roundtrip_identity():
    rgb = bytes(range(48))  # 4x4 RGB
    payload = encode_ppm(4, 4, rgb)
    assert payload.startswith(b"P6\n4 4\n255\n")
    assert decode_ppm(payload) == (4, 4, rgb)


def test_roundtrip_nonsquare_multidigit_dims():
    w, h = 12, 3
    rgb = bytes((i * 7) % 256 for i in range(3 * w * h))
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


def test_decoder_accepts_comment_headers():
    # Comments (# to EOL) between header tokens are legal P6.
    rgb = bytes(range(12))
    payload = b"P6\n# test card\n2 2\n# maxval next\n255\n" + rgb
    assert decode_ppm(payload) == (2, 2, rgb)


def test_encode_rejects_wrong_byte_count():
    with pytest.raises(ValueError):
        encode_ppm(4, 4, b"\x00" * 10)


@pytest.mark.parametrize(
    "payload",
    [
        b"P5\n2 2\n255\n" + b"\x00" * 4,  # not P6
        b"P6\n2 2\n65535\n" + b"\x00" * 24,  # 2-byte samples
        b"P6\n2 2\n255\n" + b"\x00" * 5,  # truncated pixels
    ],
)
def test_decoder_rejects_undecodable(payload):
    with pytest.raises(ValueError):
        decode_ppm(payload)


def test_feature_kernel_uses_real_decode_for_p6():
    # Uniform gray 128 image: channel means must be 128/255 exactly,
    # not a digest of the bytes.
    rgb = bytes([128] * 48)
    feats = _decode_image(encode_ppm(4, 4, rgb))
    assert feats[:3] == [128 / 255.0] * 3
    assert feats[3:] == [0.0] * 5


def test_feature_kernel_digest_fallback_for_other_formats():
    feats = _decode_image(b"\x89PNG fake bytes")
    assert len(feats) == 8
    assert all(0.0 <= f <= 1.0 for f in feats)


def test_decoder_rejects_zero_area():
    # 3*w*h = 0 would pass the pixel-length check with an empty rgb
    # slice, and downstream channel means then divide by n = 0.
    for payload in (b"P6\n0 2\n255\n", b"P6\n2 0\n255\n"):
        with pytest.raises(ValueError):
            decode_ppm(payload)


def test_feature_kernel_text_starting_p6_takes_digest_path():
    # A document whose utf-8 text happens to start with "P6 " (a
    # plausible F1 position token) must get the same digest feature
    # as any other text - never a codec error or pixel means.
    import hashlib

    text = "P6 was the final classified position for Alonso".encode()
    feats = _decode_image(text)
    digest = hashlib.sha256(text).digest()
    assert feats == [b / 255.0 for b in digest[:8]]
    # Bare "P6" glued to a non-space char fails the sniff outright.
    feats2 = _decode_image(b"P6finished ahead of P7")
    assert len(feats2) == 8
