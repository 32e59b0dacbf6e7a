"""Full-scale checkpoint dress rehearsal (VERDICT r4 #3).

The reference downloads pretrained whisper small.en, the pyannote
segmentation model, the speechbrain ECAPA embedder, and the RE-SepFormer
triplet on first start (back/api.py:657-797). This box has no network, so
every end-to-end number so far ran the random-init fallback — the
converter → device path had only ever executed at TINY dims on CPU. This
module synthesizes checkpoints that are REAL in every axis except the
trained values:

  * real DIMS   — ``model_dims("small.en")`` (244 M params),
                  ``EcapaDims()`` / ``PyannetDims()`` / ``SepformerDims()``
                  production defaults;
  * real FORMAT — openai ``.pt`` with its ``dims`` dict and **fp16**
                  tensors (openai saves ``model.half()``), a lightning
                  ``pytorch_model.bin`` with ``state_dict`` wrapper +
                  metadata keys, raw speechbrain state dicts, GPT-2-format
                  ``vocab.json``/``merges.txt`` at the full 50 257-entry
                  height;
  * real LAYOUT — the exact ``model_dir`` tree ``ModelBundle.
                  load_with_progress`` discovers (parity/README.md).

Dropping the output into ``./models`` and running ``bench.py`` / the
server then exercises converter, dims inference, fp16 upcast, tokenizer
load, and HBM fit at production scale instead of the random-init
shortcut; ``bench`` knobs record ``load_source`` so BENCH_r*.json proves
which path ran.

Values are seeded-random: compute cost is identical to trained weights
(the bench decodes a fixed token budget), only the emitted text differs.

Usage::

    python -m clearconverse_tpu.eval.dress_rehearsal --model-dir ./models
    python -m clearconverse_tpu.eval.dress_rehearsal --model-dir d --tiny
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np

# Byte-unicode alphabet (GPT-2's printable remap) — import lazily to keep
# this module import-light for the CLI --help path.


def _torch():
    import torch
    return torch


def _tensorize(sd: Dict[str, np.ndarray], half: bool = False):
    torch = _torch()
    out = {}
    for k, v in sd.items():
        t = torch.tensor(np.ascontiguousarray(np.asarray(v)))
        if half and t.is_floating_point():
            t = t.half()
        out[k] = t
    return out


def _cpu_key(seed: int):
    """PRNG + init on the host CPU backend: the default device may be a
    TPU tunnel and 244 M params of threefry output should not cross it."""
    import jax
    return jax.random.PRNGKey(seed)


def write_whisper(model_dir: str, size: str, seed: int,
                  dims=None) -> str:
    """openai-format ``{size}.pt``: ``{"dims": {...}, "model_state_dict":
    fp16 tensors}`` — exactly what whisper.load_model writes to its cache
    (the reference points download_root at cache/"whisper",
    back/api.py:660-668)."""
    import jax

    from clearconverse_tpu.models.whisper import (init_whisper_params,
                                                  model_dims)
    from clearconverse_tpu.train.checkpoint import \
        whisper_to_openai_state_dict

    dims = dims or model_dims(size)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_whisper_params(_cpu_key(seed), dims)
    sd = _tensorize(whisper_to_openai_state_dict(params), half=True)
    path = os.path.join(model_dir, f"{size}.pt")
    _torch().save({"dims": dataclasses.asdict(dims),
                   "model_state_dict": sd}, path)
    return path


def write_tokenizer(model_dir: str, n_merges: int = 50000) -> None:
    """GPT-2-format ``vocab.json`` + ``merges.txt`` at the real 50 257-entry
    height (256 byte tokens + ``n_merges`` merged tokens + endoftext).

    The merge list is synthetic but structurally valid BPE: every merge's
    parents exist before it (2-char tokens from base-pair products, then
    3-char extensions), so ``load_tokenizer`` builds the same rank tables
    it would from the real GPT-2 assets, at the same scale."""
    from clearconverse_tpu.models.tokenizer import _byte_unicode_map

    b2u = _byte_unicode_map()
    base = [b2u[b] for b in range(256)]
    vocab = {tok: i for i, tok in enumerate(base)}
    merges = []
    # Deterministic product walk over the printable tail of the alphabet.
    alpha = base[94:222]  # 128 symbols clear of specials' spellings
    n2 = 0
    two_char = []
    for a in alpha:
        for b in alpha:
            if len(merges) >= n_merges:
                break
            merges.append((a, b))
            two_char.append(a + b)
            vocab[a + b] = len(vocab)
            n2 += 1
        if len(merges) >= n_merges:
            break
    i = 0
    while len(merges) < n_merges:
        t2 = two_char[i % n2]
        c = alpha[(i // n2) % len(alpha)]
        tok = t2 + c
        if tok not in vocab:
            merges.append((t2, c))
            vocab[tok] = len(vocab)
        i += 1
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(model_dir, "vocab.json"), "w",
              encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    with open(os.path.join(model_dir, "merges.txt"), "w",
              encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")


def write_ecapa(model_dir: str, seed: int, dims=None) -> str:
    """speechbrain layout: raw state dict at
    ``embedding/embedding_model.ckpt`` (back/api.py:722-737)."""
    import jax

    from clearconverse_tpu.models.ecapa import (EcapaDims,
                                                ecapa_to_state_dict,
                                                init_ecapa_params)
    dims = dims or EcapaDims()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_ecapa_params(_cpu_key(seed), dims)
    d = os.path.join(model_dir, "embedding")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "embedding_model.ckpt")
    _torch().save(_tensorize(ecapa_to_state_dict(params)), path)
    return path


def write_pyannet(model_dir: str, seed: int, dims=None) -> str:
    """pyannote layout: lightning checkpoint (``state_dict`` wrapper +
    the metadata keys real 3.x bins carry) at
    ``segmentation/pytorch_model.bin`` (back/api.py:739-750)."""
    import jax

    from clearconverse_tpu.models.pyannet import (PyannetDims,
                                                  init_pyannet_params,
                                                  pyannet_to_state_dict)
    dims = dims or PyannetDims()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_pyannet_params(_cpu_key(seed), dims)
    d = os.path.join(model_dir, "segmentation")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "pytorch_model.bin")
    _torch().save({
        "pytorch-lightning_version": "2.0.0",
        "hyper_parameters": {"sincnet": {"stride": dims.sinc_stride}},
        "state_dict": _tensorize(pyannet_to_state_dict(params)),
    }, path)
    return path


def write_sepformer(model_dir: str, seed: int, dims=None) -> str:
    """speechbrain triplet at ``resepformer-ft/{encoder,masknet,decoder}
    .ckpt`` — the reference's fine-tune layout (back/api.py:752-764)."""
    import jax

    from clearconverse_tpu.models.resepformer import (
        SepformerDims, init_sepformer_params, sepformer_to_state_dicts)
    dims = dims or SepformerDims()
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_sepformer_params(_cpu_key(seed), dims)
    enc_sd, mask_sd, dec_sd = sepformer_to_state_dicts(params)
    d = os.path.join(model_dir, "resepformer-ft")
    os.makedirs(d, exist_ok=True)
    for name, sd in (("encoder.ckpt", enc_sd), ("masknet.ckpt", mask_sd),
                     ("decoder.ckpt", dec_sd)):
        _torch().save(_tensorize(sd), os.path.join(d, name))
    return d


_TINY_WHISPER = dict(n_mels=80, n_vocab=51864, n_audio_ctx=1500,
                     n_audio_state=64, n_audio_head=2, n_audio_layer=1,
                     n_text_ctx=448, n_text_state=64, n_text_head=2,
                     n_text_layer=1)
_TINY_ECAPA = dict(n_mels=24, channels=32, mfa_channels=48,
                   attention_channels=16, embedding_dim=16, res2net_scale=4)
_TINY_PN = dict(sinc_filters=8, conv_channels=8, lstm_hidden=8,
                lstm_layers=1, linear_dims=(8,))
_TINY_SEP = dict(enc_channels=16, d_model=16, n_heads=2, chunk_size=20,
                 n_repeats=1, n_intra_layers=1, n_inter_layers=1)


def populate(model_dir: str, size: str = "small.en", seed: int = 0,
             tiny: bool = False, tokenizer_merges: Optional[int] = None,
             skip: tuple = ()) -> Dict[str, str]:
    """Write all four families (+ tokenizer assets). ``tiny=True`` keeps
    the formats/layout but shrinks dims for tests. Returns {family: path}."""
    from clearconverse_tpu.models.ecapa import EcapaDims
    from clearconverse_tpu.models.pyannet import PyannetDims
    from clearconverse_tpu.models.resepformer import SepformerDims
    from clearconverse_tpu.models.whisper import WhisperDims

    os.makedirs(model_dir, exist_ok=True)
    out: Dict[str, str] = {}
    if "whisper" not in skip:
        out["whisper"] = write_whisper(
            model_dir, size, seed,
            dims=WhisperDims(**_TINY_WHISPER) if tiny else None)
    if "tokenizer" not in skip:
        write_tokenizer(model_dir,
                        n_merges=(tokenizer_merges if tokenizer_merges
                                  is not None else (300 if tiny else 50000)))
        out["tokenizer"] = os.path.join(model_dir, "vocab.json")
    if "ecapa" not in skip:
        out["ecapa"] = write_ecapa(
            model_dir, seed + 1,
            dims=EcapaDims(**_TINY_ECAPA) if tiny else None)
    if "pyannet" not in skip:
        out["pyannet"] = write_pyannet(
            model_dir, seed + 2,
            dims=PyannetDims(**_TINY_PN) if tiny else None)
    if "sepformer" not in skip:
        out["sepformer"] = write_sepformer(
            model_dir, seed + 3,
            dims=SepformerDims(**_TINY_SEP) if tiny else None)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--model-dir", default="./models")
    ap.add_argument("--size", default="small.en")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims, real formats (test/dev)")
    ap.add_argument("--skip", default="",
                    help="comma list: whisper,tokenizer,ecapa,pyannet,"
                         "sepformer")
    args = ap.parse_args()
    # Keep host-side init off the tunnel device and out of its compile cache.
    import jax
    jax.config.update("jax_platforms", "cpu")
    # Entry-point rule (CLAUDE.md): persistent compile cache everywhere —
    # harmless on the CPU pin, and protects against a future edit that
    # lets any of the 244M-param inits touch the tunnel backend.
    from clearconverse_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    paths = populate(args.model_dir, args.size, args.seed, args.tiny,
                     skip=tuple(s for s in args.skip.split(",") if s))
    for fam, p in sorted(paths.items()):
        sz = os.path.getsize(p) if os.path.isfile(p) else sum(
            os.path.getsize(os.path.join(p, f)) for f in os.listdir(p))
        print(f"{fam:10s} {p}  {sz / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
