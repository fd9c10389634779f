"""Pure-numpy transformer sentence encoder — the executable "real model"
path for the F19 embedding seam (reference feature_creation.py:29-121 runs
``SentenceTransformer('all-MiniLM-L6-v2')``).

This container cannot install sentence-transformers / torch / onnxruntime
(no network, no pip — COVERAGE.md records the attempt), so the ``st``
branch in features.py can never execute here.  This module closes the gap
with a genuine encoder rather than a hash stub: a BERT-architecture
forward pass (WordPiece tokenizer -> token+position embeddings -> N
post-LN transformer blocks with multi-head softmax attention and GELU
FFN -> masked mean pooling -> L2 normalization) implemented on numpy
only.  It is the same computation graph as MiniLM; given a converted
MiniLM checkpoint (a ~20-line offline ``state_dict -> npz`` export, see
``load``) it produces MiniLM's embeddings.  For in-container execution,
``make_test_checkpoint`` writes a small deterministic random-weight
checkpoint so every line of the forward pass runs un-mocked in tests
(tests/test_encoder.py) and through the Spark backfill stages
(``WIDIFF_EMBEDDINGS=npz:<dir>``).

Checkpoint layout (``model_dir/``):
  config.json  — {"hidden", "layers", "heads", "max_pos", "intermediate"}
  vocab.txt    — one WordPiece token per line ([PAD] [UNK] [CLS] [SEP],
                 word-initial pieces, ``##``-continuation pieces)
  weights.npz  — tok_emb [V,H], pos_emb [P,H], emb_ln_g/b [H], and per
                 layer ``l{i}.{q,k,v,o}_w`` [H,H], ``..._b`` [H],
                 ``l{i}.ln1_g/b``, ``l{i}.ffn_in_w`` [H,I], ``ffn_in_b``,
                 ``ffn_out_w`` [I,H], ``ffn_out_b``, ``l{i}.ln2_g/b``.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]", re.IGNORECASE)


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray,
                eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _gelu_tanh(x: np.ndarray) -> np.ndarray:
    # tanh approximation (BERT's original "gelu_new")
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


# --- vectorized double-precision erf (Cody 1969 rational approximations,
# the same three-regime scheme libm/CALERF use; ~1e-16 relative accuracy,
# grid-verified against math.erf in tests/test_encoder.py).  The previous
# np.frompyfunc(math.erf) was a per-element Python loop — prohibitive for
# a real-weights embedding backfill (ADVICE r5) ---

_ERF_A = np.array([3.16112374387056560e0, 1.13864154151050156e2,
                   3.77485237685302021e2, 3.20937758913846947e3,
                   1.85777706184603153e-1])
_ERF_B = np.array([2.36012909523441209e1, 2.44024637934444173e2,
                   1.28261652607737228e3, 2.84423683343917062e3])
_ERF_C = np.array([5.64188496988670089e-1, 8.88314979438837594e0,
                   6.61191906371416295e1, 2.98635138197400131e2,
                   8.81952221241769090e2, 1.71204761263407058e3,
                   2.05107837782607147e3, 1.23033935479799725e3,
                   2.15311535474403846e-8])
_ERF_D = np.array([1.57449261107098347e1, 1.17693950891312499e2,
                   5.37181101862009858e2, 1.62138957456669019e3,
                   3.29079923573345963e3, 4.36261909014324716e3,
                   3.43936767414372164e3, 1.23033935480374942e3])
_ERF_P = np.array([3.05326634961232344e-1, 3.60344899949804439e-1,
                   1.25781726111229246e-1, 1.60837851487422766e-2,
                   6.58749161529837803e-4, 1.63153871373020978e-2])
_ERF_Q = np.array([2.56852019228982242e0, 1.87295284992346047e0,
                   5.27905102951428412e-1, 6.05183413124413191e-2,
                   2.33520497626869185e-3])
_INV_SQRT_PI = 5.6418958354775628695e-1


def _erf(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    y = np.abs(x)
    # NaN-initialized: none of the three regime masks covers NaN, so a
    # corrupted weight / upstream overflow propagates as NaN (detectable)
    # instead of np.empty_like garbage flowing into GELU (ADVICE r6)
    out = np.full_like(y, np.nan)

    m1 = y <= 0.46875
    z = np.square(y[m1])
    xnum = _ERF_A[4] * z
    xden = z.copy()
    for i in range(3):
        xnum = (xnum + _ERF_A[i]) * z
        xden = (xden + _ERF_B[i]) * z
    out[m1] = y[m1] * (xnum + _ERF_A[3]) / (xden + _ERF_B[3])

    m2 = (y > 0.46875) & (y <= 4.0)
    y2 = y[m2]
    xnum = _ERF_C[8] * y2
    xden = y2.copy()
    for i in range(7):
        xnum = (xnum + _ERF_C[i]) * y2
        xden = (xden + _ERF_D[i]) * y2
    erfc2 = np.exp(-np.square(y2)) * (xnum + _ERF_C[7]) / (xden + _ERF_D[7])
    out[m2] = 1.0 - erfc2

    m3 = y > 4.0
    y3 = y[m3]
    z = 1.0 / np.square(y3)
    xnum = _ERF_P[5] * z
    xden = z.copy()
    for i in range(4):
        xnum = (xnum + _ERF_P[i]) * z
        xden = (xden + _ERF_Q[i]) * z
    r = z * (xnum + _ERF_P[4]) / (xden + _ERF_Q[4])
    out[m3] = 1.0 - np.exp(-np.square(y3)) * (_INV_SQRT_PI - r) / y3

    return np.copysign(out, x)


def _gelu_erf(x: np.ndarray) -> np.ndarray:
    # exact GELU 0.5*x*(1+erf(x/sqrt(2))) — what HuggingFace BERT/MiniLM
    # execute for hidden_act='gelu'; needed for 1e-4 parity with real
    # MiniLM weights (the tanh approximation drifts ~1e-3 per activation)
    return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


_ACTIVATIONS = {"gelu_tanh": _gelu_tanh, "gelu": _gelu_erf,
                "gelu_erf": _gelu_erf, "relu": _relu,
                # HF config aliases for the tanh approximation
                "gelu_new": _gelu_tanh, "gelu_pytorch_tanh": _gelu_tanh}

# Fixed sentence set for real-weights parity: the exporter records the
# sentence-transformers embeddings of exactly these sentences alongside
# the converted checkpoint, and tests/test_encoder.py replays them here.
PARITY_SENTENCES = [
    "Douglas Adams was an English author.",
    "Paris is the capital and largest city of France.",
    "The quick brown fox jumps over the lazy dog.",
    "Wikidata is a collaboratively edited knowledge base.",
    "A revision changes one or more statements of an entity.",
    "deduplication, similarity search and entity linking at scale",
    "q42 p31 q5",
    "The 2024 eclipse crossed North America on April 8, 2024.",
]


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece (the BERT/MiniLM algorithm):
    lowercase, split on whitespace/punctuation, then peel the longest
    vocab prefix, with ``##`` continuation pieces; unknown words -> [UNK]."""

    def __init__(self, vocab: list[str]):
        self.vocab = vocab
        self.ids = {tok: i for i, tok in enumerate(vocab)}
        self.pad, self.unk = self.ids["[PAD]"], self.ids["[UNK]"]
        self.cls, self.sep = self.ids["[CLS]"], self.ids["[SEP]"]
        self._max_piece = max(len(t) for t in vocab)

    def _word(self, word: str) -> list[int]:
        pieces, start, first = [], 0, True
        while start < len(word):
            end = min(len(word), start + self._max_piece)
            while end > start:
                piece = word[start:end] if first else "##" + word[start:end]
                if piece in self.ids:
                    pieces.append(self.ids[piece])
                    break
                end -= 1
            else:
                return [self.unk]  # no prefix matched -> whole word is UNK
            start, first = end, False
        return pieces

    def __call__(self, text: str, max_len: int) -> list[int]:
        ids = [self.cls]
        for word in _WORD_RE.findall(str(text).lower()):
            ids.extend(self._word(word))
            if len(ids) >= max_len - 1:
                break
        return ids[:max_len - 1] + [self.sep]


class NumpyTransformerEncoder:
    """BERT-architecture encoder over an npz checkpoint; numpy only."""

    def __init__(self, weights: dict, vocab: list[str], config: dict):
        act = config.get("act", "gelu_tanh")
        if act not in _ACTIVATIONS:
            # fail at checkpoint load with the menu, not with a bare
            # KeyError in the middle of an embedding backfill (ADVICE r5)
            raise ValueError(
                f"unsupported hidden activation {act!r}; supported: "
                f"{sorted(_ACTIVATIONS)} — re-export the checkpoint or "
                "add the activation to encoder._ACTIVATIONS")
        self.w = weights
        self.cfg = config
        self.tokenizer = WordPieceTokenizer(vocab)

    @classmethod
    def load(cls, model_dir: str) -> "NumpyTransformerEncoder":
        with open(os.path.join(model_dir, "config.json")) as fh:
            config = json.load(fh)
        with open(os.path.join(model_dir, "vocab.txt")) as fh:
            vocab = [line.rstrip("\n") for line in fh if line.strip()]
        npz = np.load(os.path.join(model_dir, "weights.npz"))
        weights = {k: npz[k].astype(np.float64) for k in npz.files}
        return cls(weights, vocab, config)

    # -- forward ---------------------------------------------------------- #

    def _attention(self, x: np.ndarray, mask: np.ndarray, li: int) -> np.ndarray:
        w, cfg = self.w, self.cfg
        B, T, H = x.shape
        nh = cfg["heads"]
        dh = H // nh

        def proj(name):
            p = (x @ w[f"l{li}.{name}_w"] + w[f"l{li}.{name}_b"])
            return p.reshape(B, T, nh, dh).transpose(0, 2, 1, 3)

        q, k, v = proj("q"), proj("k"), proj("v")
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
        scores = scores + (1.0 - mask[:, None, None, :]) * -1e9
        ctx = _softmax(scores) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, H)
        return ctx @ w[f"l{li}.o_w"] + w[f"l{li}.o_b"]

    def _forward(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        w = self.w
        T = ids.shape[1]
        x = w["tok_emb"][ids] + w["pos_emb"][:T][None, :, :]
        x = _layer_norm(x, w["emb_ln_g"], w["emb_ln_b"])
        act = _ACTIVATIONS[self.cfg.get("act", "gelu_tanh")]
        for li in range(self.cfg["layers"]):
            x = _layer_norm(x + self._attention(x, mask, li),
                            w[f"l{li}.ln1_g"], w[f"l{li}.ln1_b"])
            h = act(x @ w[f"l{li}.ffn_in_w"] + w[f"l{li}.ffn_in_b"])
            h = h @ w[f"l{li}.ffn_out_w"] + w[f"l{li}.ffn_out_b"]
            x = _layer_norm(x + h, w[f"l{li}.ln2_g"], w[f"l{li}.ln2_b"])
        # masked mean pooling + L2 norm — sentence-transformers' MiniLM head
        m = mask[:, :, None]
        pooled = (x * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1.0)
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        return pooled / np.maximum(norms, 1e-12)

    def encode(self, texts: list[str], batch_size: int = 64) -> np.ndarray:
        """float64 [n, hidden], unit-norm rows; deterministic per text and
        independent of batch composition (padding is masked everywhere)."""
        out = np.zeros((len(texts), self.cfg["hidden"]), dtype=np.float64)
        max_pos = self.cfg["max_pos"]
        for lo in range(0, len(texts), batch_size):
            chunk = texts[lo:lo + batch_size]
            tok = [self.tokenizer(t, max_pos) for t in chunk]
            T = max(len(t) for t in tok)
            ids = np.full((len(chunk), T), self.tokenizer.pad, dtype=np.int64)
            mask = np.zeros((len(chunk), T), dtype=np.float64)
            for i, t in enumerate(tok):
                ids[i, :len(t)] = t
                mask[i, :len(t)] = 1.0
            out[lo:lo + len(chunk)] = self._forward(ids, mask)
        return out


def make_test_checkpoint(model_dir: str, hidden: int = 32, layers: int = 2,
                         heads: int = 4, max_pos: int = 64,
                         intermediate: int | None = None,
                         seed: int = 7) -> str:
    """Deterministic small random-weight checkpoint so the full forward
    pass executes in-container.  The vocab covers every ascii letter/digit
    as both word-initial and ``##`` continuation pieces plus a handful of
    whole words, so real text tokenizes without collapsing to [UNK]."""
    intermediate = intermediate or hidden * 4
    rng = np.random.default_rng(seed)
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + \
            [str(d) for d in range(10)]
    words = ["the", "of", "and", "douglas", "adams", "writer", "author",
             "city", "country", "france", "paris", "human", "book"]
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + words + chars
             + ["##" + c for c in chars]
             + [".", ",", "-", "'", '"', "(", ")"])
    cfg = {"hidden": hidden, "layers": layers, "heads": heads,
           "max_pos": max_pos, "intermediate": intermediate}

    def init(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float64)

    w = {"tok_emb": init(len(vocab), hidden),
         "pos_emb": init(max_pos, hidden),
         "emb_ln_g": np.ones(hidden), "emb_ln_b": np.zeros(hidden)}
    for li in range(layers):
        for name in ("q", "k", "v", "o"):
            w[f"l{li}.{name}_w"] = init(hidden, hidden)
            w[f"l{li}.{name}_b"] = np.zeros(hidden)
        w[f"l{li}.ln1_g"] = np.ones(hidden)
        w[f"l{li}.ln1_b"] = np.zeros(hidden)
        w[f"l{li}.ffn_in_w"] = init(hidden, intermediate)
        w[f"l{li}.ffn_in_b"] = np.zeros(intermediate)
        w[f"l{li}.ffn_out_w"] = init(intermediate, hidden)
        w[f"l{li}.ffn_out_b"] = np.zeros(hidden)
        w[f"l{li}.ln2_g"] = np.ones(hidden)
        w[f"l{li}.ln2_b"] = np.zeros(hidden)

    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    with open(os.path.join(model_dir, "vocab.txt"), "w") as fh:
        fh.write("\n".join(vocab) + "\n")
    np.savez(os.path.join(model_dir, "weights.npz"), **w)
    return model_dir
