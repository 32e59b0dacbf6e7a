"""Fine-tune CLI: train Whisper on (wav, txt) pairs and export the
reference-compatible whisper-ft overlay.

    python -m clearconverse_tpu.train --data_dir pairs/ --steps 100 \
           --model small.en --export models/

``--data_dir`` holds ``name.wav`` + ``name.txt`` pairs; each pair becomes a
(mel, tokens) example (byte-fallback tokenizer unless vocab files are in the
model dir). The reference only consumes ft checkpoints; this produces them.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    from clearconverse_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    ap = argparse.ArgumentParser(prog="clearconverse-finetune")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--model", default="small.en")
    ap.add_argument("--model_dir", default="./models")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--max_tokens", type=int, default=128)
    ap.add_argument("--language", default="en",
                    help="dataset language code (multilingual models: "
                    "sets the <|lang|> prompt token inference will use)")
    ap.add_argument("--export", help="export whisper-ft overlay to this dir")
    ap.add_argument("--checkpoint", help="orbax checkpoint dir")
    ap.add_argument("--remat", action="store_true",
                    help="recompute forward activations in the backward "
                    "pass (jax.checkpoint): ~1/3 more FLOPs for the "
                    "activation memory back — enables longer mel inputs "
                    "or bigger per-device batches")
    ap.add_argument("--accum_steps", type=int, default=1,
                    help="gradient accumulation microbatches per update "
                    "(exact: unnormalized sums divide by the global token "
                    "count); --batch must divide evenly")
    ap.add_argument("--mesh", default="1x1",
                    help="data x model mesh, e.g. 4x2")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from clearconverse_tpu.audio.decode import load_audio
    from clearconverse_tpu.audio.mel import log_mel_spectrogram, pad_or_trim
    from clearconverse_tpu.models.convert import load_whisper
    from clearconverse_tpu.models.tokenizer import load_tokenizer
    from clearconverse_tpu.models.whisper import init_whisper_params
    from clearconverse_tpu.parallel.mesh import build_mesh
    from clearconverse_tpu.parallel.sharding import shard_params
    from clearconverse_tpu.train.finetune import (
        default_optimizer, init_train_state, make_train_step)

    params, dims = load_whisper(args.model_dir, args.model)
    if params is None:
        print("no base checkpoint found; training from random init")
        params = init_whisper_params(jax.random.PRNGKey(0), dims)
    tok = load_tokenizer(args.model_dir, english=args.model.endswith(".en"))
    sp = tok.specials
    # Train on the SAME prompt prefix inference uses (bundle._prompt_batch):
    # bare [sot] for .en models, [sot, <|lang|>, <|transcribe|>] for
    # multilingual — each followed by <|notimestamps|>. Hand-rolling
    # [sot, no_timestamps] for a multilingual model would fine-tune on a
    # prompt (and token positions) the serving path never produces.
    if sp.english_only:
        prefix = [sp.sot, sp.no_timestamps]
    else:
        prefix = list(sp.sot_sequence(sp.language_token(args.language))) \
            + [sp.no_timestamps]

    # Build the dataset: mel [N,80,3000]; tokens = [prefix, text..., eot].
    examples = []
    for name in sorted(os.listdir(args.data_dir)):
        if not name.endswith(".wav"):
            continue
        txt = os.path.join(args.data_dir, name[:-4] + ".txt")
        if not os.path.exists(txt):
            continue
        wave, _ = load_audio(os.path.join(args.data_dir, name), denoise=False)
        mel = np.asarray(log_mel_spectrogram(
            pad_or_trim(jnp.asarray(wave)[None], 30 * 16000)))[0]
        with open(txt, encoding="utf-8") as fh:
            text = fh.read().strip()
        ids = prefix + tok.encode(text)[: args.max_tokens - len(prefix) - 1] \
            + [sp.eot]
        examples.append((mel, ids))
    if not examples:
        print("no (wav, txt) pairs found")
        return 1
    print(f"{len(examples)} training pairs")

    L = args.max_tokens
    data_mel = np.stack([m for m, _ in examples])
    data_tok = np.full((len(examples), L), sp.eot, np.int32)
    data_mask = np.zeros((len(examples), L), np.float32)
    for i, (_, ids) in enumerate(examples):
        data_tok[i, : len(ids)] = ids
        data_mask[i, : len(ids) - 1] = 1.0

    d, m = (int(v) for v in args.mesh.split("x"))
    n_dev = len(jax.devices())
    if 1 < d * m < n_dev:
        # Training on a submesh usually means a misconfiguration leaving
        # chips idle (serving submeshes are the legitimate case and build
        # silently via parallel.mesh.build_mesh).
        print(f"WARNING: --mesh {d}x{m} uses {d * m} of {n_dev} devices "
              f"({n_dev - d * m} idle); use --mesh with data*model="
              f"{n_dev} to train on all of them")
    mesh = build_mesh(data=d, model=m) if d * m > 1 else None
    opt = default_optimizer(lr=args.lr)
    if mesh:
        with mesh:
            params = shard_params(params, mesh)
    state = init_train_state(params, opt)
    step_fn = make_train_step(dims, opt, mesh=mesh,
                          remat=args.remat,
                          accum_steps=args.accum_steps)

    rng = np.random.default_rng(0)
    p, o, s = state.params, state.opt_state, state.step
    for it in range(args.steps):
        pick = rng.integers(0, len(examples), args.batch)
        batch = {
            "mel": jnp.asarray(data_mel[pick]),
            "tokens": jnp.asarray(data_tok[pick]),
            "targets": jnp.asarray(np.roll(data_tok[pick], -1, axis=1)),
            "loss_mask": jnp.asarray(data_mask[pick]),
        }
        p, o, s, metrics = step_fn(p, o, batch, s)
        if it % 10 == 0 or it == args.steps - 1:
            print(f"step {it}: loss={float(metrics['loss']):.4f} "
                  f"acc={float(metrics['accuracy']):.3f}")

    if args.checkpoint:
        from clearconverse_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint, p, o, int(s))
        print(f"checkpoint → {args.checkpoint}")
    if args.export:
        from clearconverse_tpu.train.checkpoint import export_whisper_ft
        path = export_whisper_ft(jax.device_get(p), args.export)
        print(f"whisper-ft overlay → {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
