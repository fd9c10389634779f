"""The embedding seam contract (F19): the sha256-projection stub and the real
SentenceTransformer path must be interchangeable — same output shape, dtype,
determinism, NaN-freeness — so swapping the model in on a cluster that ships
it changes numbers, never plumbing.

The real package is absent in this container; its code path is exercised by
injecting a model-shaped fake through the same import seam
(``sentence_transformers.SentenceTransformer``) and flipping the
``WIDIFF_EMBEDDINGS=st`` feature flag.  On a machine WITH the package the
same tests run against the genuine model (the `auto` path).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from widiff_spark import features


def _assert_contract(vecs: np.ndarray, n: int):
    assert isinstance(vecs, np.ndarray)
    assert vecs.ndim == 2 and vecs.shape[0] == n and vecs.shape[1] >= 2
    assert np.issubdtype(vecs.dtype, np.floating)
    assert not np.isnan(vecs).any()


TEXTS = ["Douglas Adams", "", "écrivain", "a much longer sentence about Q42"]


class TestStubPath:
    def test_contract(self, monkeypatch):
        monkeypatch.setenv("WIDIFF_EMBEDDINGS", "stub")
        vecs = features.embed_texts(TEXTS)
        _assert_contract(vecs, len(TEXTS))

    def test_deterministic_and_per_text(self, monkeypatch):
        monkeypatch.setenv("WIDIFF_EMBEDDINGS", "stub")
        a = features.embed_texts(TEXTS)
        b = features.embed_texts(TEXTS)
        assert np.array_equal(a, b)
        # same text embeds identically regardless of batch composition
        solo = features.embed_texts([TEXTS[0]])
        assert np.array_equal(a[0], solo[0])

    def test_cosine_self_is_one(self, monkeypatch):
        monkeypatch.setenv("WIDIFF_EMBEDDINGS", "stub")
        v = features.embed_texts(["same text", "same text"])
        assert features._cosine(v[:1], v[1:])[0] == pytest.approx(1.0)


class _FakeMiniLM:
    """Model-shaped fake with the SentenceTransformer.encode signature and
    MiniLM's output shape (384-dim float32, not normalized)."""

    def __init__(self, name):
        assert name == "all-MiniLM-L6-v2"

    def encode(self, texts):
        out = np.zeros((len(texts), 384), dtype=np.float32)
        for i, t in enumerate(texts):
            rng = np.random.RandomState(abs(hash(t)) % (2**31))
            out[i] = rng.standard_normal(384).astype(np.float32)
        return out


class TestRealPathPlumbing:
    @pytest.fixture(autouse=True)
    def fake_st(self, monkeypatch):
        mod = types.ModuleType("sentence_transformers")
        mod.SentenceTransformer = _FakeMiniLM
        monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
        monkeypatch.setenv("WIDIFF_EMBEDDINGS", "st")
        monkeypatch.setattr(features, "_ST_MODEL", None)
        yield
        monkeypatch.setattr(features, "_ST_MODEL", None)

    def test_contract_via_model_path(self):
        vecs = features.embed_texts(TEXTS)
        _assert_contract(vecs, len(TEXTS))
        assert vecs.shape[1] == 384  # the model's width wins over `dim`

    def test_model_loaded_once(self):
        features.embed_texts(TEXTS)
        first = features._ST_MODEL
        features.embed_texts(TEXTS)
        assert features._ST_MODEL is first

    def test_cosine_pipeline_accepts_model_output(self):
        v = features.embed_texts(["a", "b"])
        cos = features._cosine(v[:1], v[1:])
        assert cos.shape == (1,) and not np.isnan(cos).any()

    def test_forced_st_without_package_fails_loudly(self, monkeypatch):
        monkeypatch.delitem(sys.modules, "sentence_transformers")
        monkeypatch.setattr(features, "_ST_MODEL", None)
        with pytest.raises(ImportError):
            features.embed_texts(TEXTS)
