"""Property-based codec tests (hypothesis, no Spark session): the
multimodal decoders promise a TYPED error contract — for ANY payload,
``decode_video`` / ``decode_audio`` / ``decode_image`` either return a
feature dict or raise ValueError. Anything else (struct.error,
ZeroDivisionError, IndexError, numpy reshape errors) would escape the
Arrow batch handlers' ``except ValueError`` doc_id-wrapping and kill the
stage with no row context. Hypothesis drives three payload families:
pure garbage, truncations of valid containers, and single-byte
mutations of valid containers (the nastiest: structurally almost-valid).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from log_analysis_system_spark.operators import multimodal as mm

_DOC_IDS = st.integers(0, 40)


def _check_typed(decode, payload):
    try:
        out = decode(payload)
    except ValueError:
        return
    assert isinstance(out, dict)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_video_decode_typed_on_garbage(payload):
    _check_typed(mm.decode_video, payload)


@settings(max_examples=150, deadline=None)
@given(_DOC_IDS, st.integers(0, 10_000))
def test_video_decode_typed_on_truncation(doc_id, cut):
    b = mm.make_video(doc_id)
    _check_typed(mm.decode_video, b[: cut % (len(b) + 1)])


@settings(max_examples=300, deadline=None)
@given(_DOC_IDS, st.integers(0, 10_000), st.integers(1, 255))
def test_video_decode_typed_on_single_byte_mutation(doc_id, pos, delta):
    b = bytearray(mm.make_video(doc_id))
    i = pos % len(b)
    b[i] = (b[i] + delta) % 256
    _check_typed(mm.decode_video, bytes(b))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_audio_decode_typed_on_garbage(payload):
    _check_typed(mm.decode_audio, payload)


@settings(max_examples=300, deadline=None)
@given(_DOC_IDS, st.integers(0, 10_000), st.integers(1, 255))
def test_audio_decode_typed_on_single_byte_mutation(doc_id, pos, delta):
    b = bytearray(mm.make_wav(doc_id))
    i = pos % len(b)
    b[i] = (b[i] + delta) % 256
    _check_typed(mm.decode_audio, bytes(b))


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_image_decode_typed_on_garbage(payload):
    _check_typed(mm.decode_image, payload)


@settings(max_examples=300, deadline=None)
@given(_DOC_IDS, st.integers(0, 10_000), st.integers(1, 255))
def test_image_decode_typed_on_single_byte_mutation(doc_id, pos, delta):
    b = bytearray(mm.make_ppm(doc_id))
    i = pos % len(b)
    b[i] = (b[i] + delta) % 256
    _check_typed(mm.decode_image, bytes(b))


@settings(max_examples=100, deadline=None)
@given(_DOC_IDS)
def test_decoders_roundtrip_valid_payloads(doc_id):
    """Sanity anchor for the fuzz families: untouched payloads decode."""
    assert mm.decode_video(mm.make_video(doc_id))["n_frames"] >= 4
    assert mm.decode_audio(mm.make_wav(doc_id))["n_samples"] >= 16
    assert mm.decode_image(mm.make_ppm(doc_id))["width"] >= 2
