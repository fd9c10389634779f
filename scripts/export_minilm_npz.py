#!/usr/bin/env python
"""Export a real MiniLM/BERT checkpoint to the encoder.py npz layout.

This is the offline converter the encoder docstring promises (run it on
any machine that has torch — NOT this container, which has neither torch
nor network access; COVERAGE.md records the proof-of-attempt).  Usage:

    python scripts/export_minilm_npz.py <hf_dir> <out_dir> [--reference]

``hf_dir`` is a downloaded HuggingFace checkpoint directory (e.g. a
local clone of sentence-transformers/all-MiniLM-L6-v2) containing
config.json, vocab.txt and pytorch_model.bin / model.safetensors.
The output directory then drives the pure-numpy encoder in-container:

    WIDIFF_EMBEDDINGS=npz:<out_dir>          # Spark backfill path
    WIDIFF_MINILM_DIR=<out_dir> pytest tests/test_encoder.py  # parity

``--reference`` additionally records the sentence-transformers
embeddings of ``encoder.PARITY_SENTENCES`` as ``reference.npz`` (needs
the sentence-transformers package at export time); the presence-gated
parity test (tests/test_encoder.py::TestRealMiniLMParity) then asserts
the numpy forward pass reproduces them to 1e-4 without importing torch.

Weight-name mapping (HF BertModel -> encoder.py npz):
    embeddings.word_embeddings.weight              -> tok_emb
    embeddings.position_embeddings.weight          -> pos_emb  (+ the
      token_type row 0 folded in: single-sentence inputs always use
      type id 0, and the encoder has no token-type term)
    embeddings.LayerNorm.{weight,bias}             -> emb_ln_{g,b}
    encoder.layer.{i}.attention.self.{query,key,value}.{weight.T,bias}
                                                   -> l{i}.{q,k,v}_{w,b}
    encoder.layer.{i}.attention.output.dense.{weight.T,bias}
                                                   -> l{i}.o_{w,b}
    encoder.layer.{i}.attention.output.LayerNorm   -> l{i}.ln1_{g,b}
    encoder.layer.{i}.intermediate.dense.{weight.T,bias}
                                                   -> l{i}.ffn_in_{w,b}
    encoder.layer.{i}.output.dense.{weight.T,bias} -> l{i}.ffn_out_{w,b}
    encoder.layer.{i}.output.LayerNorm             -> l{i}.ln2_{g,b}
(torch Linear stores [out, in]; the encoder computes x @ w, hence .T.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np


def _load_state_dict(hf_dir: str) -> dict:
    """state_dict as {name: numpy array}, torch or safetensors backed."""
    bin_path = os.path.join(hf_dir, "pytorch_model.bin")
    st_path = os.path.join(hf_dir, "model.safetensors")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    raise FileNotFoundError(
        f"no pytorch_model.bin or model.safetensors under {hf_dir}")


def _strip_prefix(sd: dict) -> dict:
    """Drop a leading 'bert.' / '0.auto_model.' wrapper prefix if present."""
    for prefix in ("bert.", "0.auto_model."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}
    return sd


def convert_arrays(sd: dict, hf_cfg: dict) -> tuple[dict, dict]:
    """(cfg, weights) from a {name: numpy array} BERT state_dict — the
    pure mapping, IO-free so the container test suite can exercise the
    transpose/fold conventions without torch installed."""
    cfg = {"hidden": hf_cfg["hidden_size"],
           "layers": hf_cfg["num_hidden_layers"],
           "heads": hf_cfg["num_attention_heads"],
           "max_pos": hf_cfg["max_position_embeddings"],
           "intermediate": hf_cfg["intermediate_size"],
           # 'gelu' in an HF config is the exact erf form
           "act": hf_cfg.get("hidden_act", "gelu")}
    from widiff_spark.encoder import _ACTIVATIONS
    if cfg["act"] not in _ACTIVATIONS:
        raise ValueError(
            f"checkpoint uses hidden_act={cfg['act']!r}, which the numpy "
            f"encoder does not implement (supported: {sorted(_ACTIVATIONS)})"
            " — converting it would only fail later at load time")
    sd = _strip_prefix(sd)

    def t(name):  # torch Linear weight [out, in] -> x @ w layout [in, out]
        return np.asarray(sd[name], dtype=np.float64).T

    def v(name):
        return np.asarray(sd[name], dtype=np.float64)

    w = {"tok_emb": v("embeddings.word_embeddings.weight"),
         # single sentences always carry token type 0 -> fold that row in
         "pos_emb": v("embeddings.position_embeddings.weight")
         + v("embeddings.token_type_embeddings.weight")[0][None, :],
         "emb_ln_g": v("embeddings.LayerNorm.weight"),
         "emb_ln_b": v("embeddings.LayerNorm.bias")}
    for i in range(cfg["layers"]):
        p = f"encoder.layer.{i}."
        w[f"l{i}.q_w"] = t(p + "attention.self.query.weight")
        w[f"l{i}.q_b"] = v(p + "attention.self.query.bias")
        w[f"l{i}.k_w"] = t(p + "attention.self.key.weight")
        w[f"l{i}.k_b"] = v(p + "attention.self.key.bias")
        w[f"l{i}.v_w"] = t(p + "attention.self.value.weight")
        w[f"l{i}.v_b"] = v(p + "attention.self.value.bias")
        w[f"l{i}.o_w"] = t(p + "attention.output.dense.weight")
        w[f"l{i}.o_b"] = v(p + "attention.output.dense.bias")
        w[f"l{i}.ln1_g"] = v(p + "attention.output.LayerNorm.weight")
        w[f"l{i}.ln1_b"] = v(p + "attention.output.LayerNorm.bias")
        w[f"l{i}.ffn_in_w"] = t(p + "intermediate.dense.weight")
        w[f"l{i}.ffn_in_b"] = v(p + "intermediate.dense.bias")
        w[f"l{i}.ffn_out_w"] = t(p + "output.dense.weight")
        w[f"l{i}.ffn_out_b"] = v(p + "output.dense.bias")
        w[f"l{i}.ln2_g"] = v(p + "output.LayerNorm.weight")
        w[f"l{i}.ln2_b"] = v(p + "output.LayerNorm.bias")
    return cfg, w


def convert(hf_dir: str, out_dir: str) -> dict:
    with open(os.path.join(hf_dir, "config.json")) as fh:
        hf_cfg = json.load(fh)
    cfg, w = convert_arrays(_load_state_dict(hf_dir), hf_cfg)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    shutil.copyfile(os.path.join(hf_dir, "vocab.txt"),
                    os.path.join(out_dir, "vocab.txt"))
    np.savez(os.path.join(out_dir, "weights.npz"), **w)
    return cfg


def record_reference(hf_dir: str, out_dir: str) -> None:
    """Sentence-transformers embeddings of the fixed parity set, stored
    next to the converted weights so the in-container parity test needs
    no torch."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from widiff_spark.encoder import PARITY_SENTENCES

    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(hf_dir)
    emb = model.encode(PARITY_SENTENCES, normalize_embeddings=True,
                       convert_to_numpy=True).astype(np.float64)
    np.savez(os.path.join(out_dir, "reference.npz"),
             sentences=np.array(PARITY_SENTENCES, dtype=object),
             embeddings=emb)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("hf_dir", help="downloaded HuggingFace checkpoint dir")
    ap.add_argument("out_dir", help="npz checkpoint output dir")
    ap.add_argument("--reference", action="store_true",
                    help="also record sentence-transformers embeddings of "
                         "the fixed parity sentence set (reference.npz)")
    args = ap.parse_args()
    cfg = convert(args.hf_dir, args.out_dir)
    print(f"converted: {cfg}")
    if args.reference:
        record_reference(args.hf_dir, args.out_dir)
        print("recorded reference.npz (sentence-transformers parity set)")


if __name__ == "__main__":
    main()
