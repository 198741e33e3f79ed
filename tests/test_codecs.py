"""Codec seam: the single encode/decode interface per modality
(sources/codecs.py) that real libraries (Pillow, soundfile) drop into
without touching Spark plumbing."""

import importlib.util

import numpy as np
import pytest

from barefoot_spark.sources import codecs as C
from barefoot_spark.sources import images as IM
from barefoot_spark.sources import media as MD

_HAS_PIL = importlib.util.find_spec("PIL") is not None
_HAS_SF = importlib.util.find_spec("soundfile") is not None


@pytest.mark.skipif(_HAS_PIL or _HAS_SF,
                    reason="real codec libs installed: the seam "
                           "correctly resolves the real adapters")
def test_default_resolution_in_sandbox():
    """No PIL/soundfile in this container: the seam must resolve to the
    deterministic stand-ins, and the Pillow adapter must fail with a
    clean ImportError (the drop-in signal). Skipped — correctly — in
    any environment where the libraries exist."""
    assert C.get_image_codec().name == "standin"
    assert C.get_audio_codec().name == "standin"
    assert C.get_video_codec().name == "standin"
    with pytest.raises(ImportError):
        C.PillowImageCodec()
    with pytest.raises(ImportError):
        C.SoundFileAudioCodec()


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_pillow_adapter_when_available():
    """With Pillow installed: real round-trip meets the PSNR invariant
    and pre-upgrade stand-in blobs still decode (zlib sniff)."""
    codec = C.PillowImageCodec()
    px = IM.synth_pixels("img-42-00000001", 32, 24)
    assert np.array_equal(codec.decode(codec.encode(px, "png"),
                                       32, 24, "png"), px)
    assert IM.psnr(codec.decode(codec.encode(px, "jpeg"), 32, 24, "jpeg"),
                   px) >= 40.0
    standin_blob = C.StandInImageCodec().encode(px, "png")
    assert np.array_equal(codec.decode(standin_blob, 32, 24, "png"), px)


def test_standin_image_roundtrip_unchanged():
    """Stand-in behavior is byte-identical to the pre-seam codec: png
    lossless round-trip, jpeg 6-bit quantized with PSNR >= 40 dB,
    unknown formats rejected."""
    px = IM.synth_pixels("img-42-00000001", 32, 24)
    png = IM.encode_image(px, "png")
    assert np.array_equal(IM.decode_image(png, 32, 24, "png"), px)
    jpg = IM.encode_image(px, "jpeg")
    dec = IM.decode_image(jpg, 32, 24, "jpeg")
    assert IM.psnr(dec, px) >= 40.0
    with pytest.raises(NotImplementedError):
        IM.encode_image(px, "webp")
    with pytest.raises(NotImplementedError):
        IM.decode_image(png, 32, 24, "webp")


def test_standin_rejects_real_codec_blobs():
    """Mixed-fleet downgrade path: the stand-in must refuse real
    PNG/JPEG bytes with an actionable message (install Pillow), not
    die in zlib.decompress deep inside a task."""
    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    jpg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    for blob in (png_magic, jpg_magic):
        with pytest.raises(RuntimeError, match="install Pillow"):
            C.StandInImageCodec().decode(blob, 4, 4, "png")


def test_custom_codec_drops_in():
    """A custom codec honoring the interface slots into every consumer
    (encode_image/decode_image, resize path) without code changes —
    the contract a PIL adapter relies on."""
    class XorCodec:
        name = "xor"

        def encode(self, pixels, fmt):
            return bytes(b ^ 0x5A for b in pixels.tobytes())

        def decode(self, data, w, h, fmt):
            raw = np.frombuffer(bytes(b ^ 0x5A for b in data),
                                dtype=np.uint8)
            return raw.reshape(h, w, 3).copy()

    old = C.set_image_codec(XorCodec())
    try:
        assert C.get_image_codec().name == "xor"
        px = IM.synth_pixels("x", 8, 6)
        blob = IM.encode_image(px, "jpeg")       # fmt ignored by XorCodec
        assert np.array_equal(IM.decode_image(blob, 8, 6, "jpeg"), px)
        rz = MD.resize_pixels(IM.decode_image(blob, 8, 6, "png"), 4, 3)
        assert rz.shape == (3, 4, 3)
    finally:
        C.set_image_codec(old)
    assert C.get_image_codec() is old   # restored


def test_standin_audio_video_unchanged():
    pcm = MD.synth_pcm("aud-00000", 8000, 800)
    blob = MD.encode_audio(pcm)
    assert np.array_equal(MD.decode_audio(blob), pcm)
    if not _HAS_SF:   # with soundfile installed, non-pcm codecs WORK
        with pytest.raises(NotImplementedError):
            MD.encode_audio(pcm, codec="mp3")
    data = MD.encode_video("vid-1", 16, 12, 5)
    offs = MD.video_frame_offsets(data)
    assert len(offs) == 5
    fr = MD.decode_frame(data, offs, 3, 16, 12)
    assert np.array_equal(fr, MD.synth_frame("vid-1", 3, 16, 12))
    with pytest.raises(NotImplementedError):
        MD.decode_frame(data, offs, 0, 16, 12, codec="h264")
