"""BPE cross-validation against transformers' GPT2Tokenizer on SYNTHETIC
assets (VERDICT r3 weak #5: the real-BPE path had never been validated
against a real vocab.json/merges.txt — one wrong merge-order detail means
wrong transcripts everywhere on day one with real weights).

No network/asset downloads: a genuine byte-level BPE is TRAINED in-test
(same GPT-2 byte→unicode mapping and pre-tokenization regex), written out
as vocab.json + merges.txt, and loaded by BOTH our
models.tokenizer.BPETokenizer (via load_tokenizer) and
transformers.GPT2Tokenizer (pure-python slow tokenizer, works offline from
local files). Token ids must match exactly on a battery of adversarial
strings. The .tiktoken rank-file path (merges reconstructed from rank
order by _merges_from_ranks) must produce the same encodings again.

The real-asset goldens in test_tokenizer.py stay as the final check when
vocab files exist; this file proves the ALGORITHM (merge order, regex
splitting, byte mapping, decode round-trip) against the reference
implementation today.
"""

import base64
import collections
import json

import pytest

try:
    from transformers import GPT2Tokenizer
except Exception:  # noqa: BLE001 — transformers is baked into this image
    GPT2Tokenizer = None

from clearconverse_tpu.models.tokenizer import (BPETokenizer,
                                                _byte_unicode_map,
                                                load_tokenizer)

GPT2_SPLIT = (r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
              r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

CORPUS = """
The quick brown fox jumps over the lazy dog. The dog didn't mind; it had
seen the fox before, and the fox had seen the dog. They're old friends,
these two, and they'll meet again tomorrow at 10:30 in the morning.
I've counted 1234 foxes and 5678 dogs this year -- that's a lot!
"Surely," she said, "you can't be serious?" But he was serious, and
don't call him Shirley. The theatre's colour scheme favoured grey.
  indentation   and   runs   of   spaces matter,
and so do newlines. café naïve résumé — déjà vu. 日本語のテキスト。
Emoji too: 🦊🐶. End of corpus.
""" * 3


def train_bpe(corpus: str, n_merges: int = 200):
    """Plain byte-level BPE training: pre-tokenize with GPT-2's regex, map
    bytes through the byte→unicode table, then greedily merge the most
    frequent adjacent pair (count ties broken lexicographically so the
    assets are deterministic)."""
    import regex

    b2u = _byte_unicode_map()
    pat = regex.compile(GPT2_SPLIT)
    words = collections.Counter()
    for piece in pat.findall(corpus):
        words[tuple(b2u[b] for b in piece.encode("utf-8"))] += 1

    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        new_words = collections.Counter()
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words

    vocab = {}
    for u in sorted(b2u.values()):          # 256 byte units first
        vocab[u] = len(vocab)
    for a, b in merges:                      # then merge products in order
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    return vocab, merges


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_assets")
    vocab, merges = train_bpe(CORPUS)
    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False),
                                  encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8")
    return d, vocab, merges


STRINGS = [
    "The quick brown fox jumps over the lazy dog.",
    "they're friends and they'll meet; don't call him Shirley",
    "I've counted 1234 foxes -- that's a lot!",
    "  leading spaces and   interior   runs  ",
    "tabs\tand\nnewlines\n\nand  mixes \t \n",
    "punctuation?! ... ((nested)) [brackets] {braces} <angle>",
    "café naïve résumé — déjà vu",
    "日本語のテキストです。",
    "mixed English と日本語 in one line",
    "emoji 🦊 in 🐶 text",
    "CAPS lower MiXeD 'quoted' \"double\"",
    "numbers 10:30, 1,234.56 and -42",
    "unseen words zyzzyva qwertyuiop asdfghjkl",
    "trailing space ",
    " ",
    "",
    "a",
    "'s 't 're 've 'm 'll 'd",
]


@pytest.mark.skipif(GPT2Tokenizer is None, reason="transformers missing")
def test_encodings_match_transformers(assets):
    d, vocab, merges = assets
    ours = load_tokenizer(str(d), english=True)
    assert isinstance(ours, BPETokenizer)
    hf = GPT2Tokenizer(vocab_file=str(d / "vocab.json"),
                       merges_file=str(d / "merges.txt"))
    for s in STRINGS:
        got = ours.encode(s)
        want = hf(s)["input_ids"]
        assert got == want, (s, got, want)
        # exact round trip (no bytes lost through the unicode mapping)
        assert ours.decode(got) == s == hf.decode(want)


@pytest.mark.skipif(GPT2Tokenizer is None, reason="transformers missing")
def test_tiktoken_rank_reconstruction_matches(assets, tmp_path):
    """The .tiktoken load path carries only token→rank; merges are
    reconstructed by _merges_from_ranks. Encodings must equal the
    vocab.json+merges.txt path (and therefore transformers) exactly."""
    d, vocab, merges = assets
    u2b = {u: b for b, u in _byte_unicode_map().items()}
    lines = []
    for tok, rank in sorted(vocab.items(), key=lambda kv: kv[1]):
        raw = bytes(u2b[ch] for ch in tok)
        lines.append(base64.b64encode(raw) + b" " + str(rank).encode())
    tk = tmp_path / "ranks.tiktoken"
    tk.write_bytes(b"\n".join(lines) + b"\n")

    ours = load_tokenizer(str(tmp_path), english=True)
    assert isinstance(ours, BPETokenizer)
    ref = load_tokenizer(str(d), english=True)
    for s in STRINGS:
        assert ours.encode(s) == ref.encode(s), s
        assert ours.decode(ours.encode(s)) == s


def test_trained_assets_are_nontrivial(assets):
    _, vocab, merges = assets
    assert len(merges) >= 150                 # real multi-level merges
    assert any(len(a + b) >= 6 for a, b in merges)   # deep merge chains
    joined = {a + b for a, b in merges}
    # chained merges exist: some merge's parent is itself a merge product
    assert any(a in joined or b in joined for a, b in merges)
