"""Multimodal decoder seam: the default path must never depend on which
codec libraries are importable (VERDICT r5 defect #1 — the old seam raised
NotImplementedError for every image row whenever Pillow was installed)."""

from __future__ import annotations

import numpy as np
import pytest

from widiff_spark import multimodal


def _pseudo(payload: bytes) -> np.ndarray:
    return multimodal._decode_payload(payload, "image/png")


def test_decode_ignores_pil_presence(monkeypatch):
    """Same bytes in, same features out, whether or not PIL is importable."""
    without = _pseudo(b"payload-bytes")
    monkeypatch.setattr(multimodal, "_HAS_PIL", True)
    monkeypatch.delenv("WIDIFF_MEDIA_DECODE", raising=False)
    with_pil = _pseudo(b"payload-bytes")
    assert np.array_equal(without, with_pil)
    assert with_pil.shape == (64,)


def test_optin_decode_never_raises_on_bad_payload(monkeypatch):
    """Opt-in path with an unusable decoder (no real PIL here, so the
    import inside the branch fails) must fall back, not crash."""
    monkeypatch.setattr(multimodal, "_HAS_PIL", True)
    monkeypatch.setenv("WIDIFF_MEDIA_DECODE", "pil")
    out = _pseudo(b"not-a-png")
    assert out.shape == (64,)
    assert np.array_equal(out, multimodal._decode_payload(b"not-a-png",
                                                          "image/png"))


def test_decode_deterministic_and_media_type_blind_by_default():
    a = multimodal._decode_payload(b"x", "image/png")
    b = multimodal._decode_payload(b"x", "audio/wav")
    assert np.array_equal(a, b)
    assert np.all(np.abs(a) <= 1.0)


@pytest.mark.usefixtures("spark")
def test_extract_features_returns_rows(spark):
    docs = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(12)], "doc_id long, text string")
    media = multimodal.synthesize_media(docs)
    rows = multimodal.extract_features(media).collect()
    assert len(rows) == 12
    assert all(len(r["feature"]) == 64 for r in rows)


class TestAudioVideoSeams:
    """VERDICT r6 ask #8: the audio (soundfile) and video (av) seams get
    the same contract as the image one — presence of the lib never
    changes the default path, opt-in routes through the real decoder,
    and a crashing decode falls back instead of raising."""

    CASES = [("audio/wav", "_HAS_SOUNDFILE", "soundfile",
              "_soundfile_audio_features"),
             ("video/mp4", "_HAS_AV", "av", "_av_video_features")]

    @pytest.mark.parametrize("mt,flag,token,fn", CASES)
    def test_presence_alone_never_changes_default(self, monkeypatch, mt,
                                                  flag, token, fn):
        monkeypatch.delenv("WIDIFF_MEDIA_DECODE", raising=False)
        base = multimodal._decode_payload(b"payload", mt)
        monkeypatch.setattr(multimodal, flag, True)
        assert np.array_equal(multimodal._decode_payload(b"payload", mt),
                              base)

    @pytest.mark.parametrize("mt,flag,token,fn", CASES)
    def test_optin_routes_through_real_decoder(self, monkeypatch, mt,
                                               flag, token, fn):
        sentinel = np.linspace(-1.0, 0.9, 64)
        monkeypatch.setattr(multimodal, flag, True)
        monkeypatch.setattr(multimodal, fn, lambda payload: sentinel)
        monkeypatch.setenv("WIDIFF_MEDIA_DECODE", token)
        out = multimodal._decode_payload(b"payload", mt)
        assert np.array_equal(out, sentinel)

    @pytest.mark.parametrize("mt,flag,token,fn", CASES)
    def test_optin_crash_falls_back_not_raises(self, monkeypatch, mt,
                                               flag, token, fn):
        def boom(payload):
            raise RuntimeError("undecodable")

        monkeypatch.setattr(multimodal, flag, True)
        monkeypatch.setattr(multimodal, fn, boom)
        monkeypatch.setenv("WIDIFF_MEDIA_DECODE", token)
        out = multimodal._decode_payload(b"payload", mt)
        monkeypatch.delenv("WIDIFF_MEDIA_DECODE")
        assert np.array_equal(out,
                              multimodal._decode_payload(b"payload", mt))

    def test_comma_separated_modes_route_independently(self, monkeypatch):
        """pil,soundfile,av in one env var: each modality takes its own
        seam, none leaks into another's media type."""
        audio_sentinel = np.full(64, 0.25)
        monkeypatch.setattr(multimodal, "_HAS_SOUNDFILE", True)
        monkeypatch.setattr(multimodal, "_soundfile_audio_features",
                            lambda payload: audio_sentinel)
        monkeypatch.setenv("WIDIFF_MEDIA_DECODE", "pil,soundfile,av")
        assert np.array_equal(
            multimodal._decode_payload(b"x", "audio/wav"), audio_sentinel)
        # video opted in but av not importable -> pseudo path
        monkeypatch.delenv("WIDIFF_MEDIA_DECODE")
        base_video = multimodal._decode_payload(b"x", "video/mp4")
        monkeypatch.setenv("WIDIFF_MEDIA_DECODE", "pil,soundfile,av")
        assert np.array_equal(
            multimodal._decode_payload(b"x", "video/mp4"), base_video)

    def test_soundfile_branch_contract(self):
        """If real soundfile is present, the branch emits the 64-float
        [-1, 1] contract on a real WAV (skips where absent)."""
        sf = pytest.importorskip("soundfile")
        import io

        buf = io.BytesIO()
        wave = np.sin(np.linspace(0, 440 * 2 * np.pi, 8000))
        sf.write(buf, wave, 8000, format="WAV")
        out = multimodal._soundfile_audio_features(buf.getvalue())
        assert out.shape == (64,)
        assert np.all((out >= -1.0) & (out <= 1.0))


def test_pil_branch_contract():
    """If real Pillow is present AND opted in, the branch emits the same
    64-float [-1, 1) contract (skips where Pillow is absent)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 20), (120, 30, 200)).save(buf, format="PNG")
    out = multimodal._pil_image_features(buf.getvalue())
    assert out.shape == (64,)
    assert np.all((out >= -1.0) & (out < 1.0))
