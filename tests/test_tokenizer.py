"""Tokenizer tests: special-token layout constants (whisper's table),
byte-level BPE encode/decode with a handmade vocabulary, byte fallback."""

import numpy as np

from clearconverse_tpu.models.tokenizer import (
    BPETokenizer, ByteFallbackTokenizer, SpecialTokens, _byte_unicode_map)


def test_special_token_layout_english():
    s = SpecialTokens.for_model(english=True)
    # Known openai-whisper constants for *.en models.
    assert s.eot == 50256
    assert s.sot == 50257
    assert s.translate == 50357
    assert s.transcribe == 50358
    assert s.sot_prev == 50360
    assert s.no_speech == 50361
    assert s.no_timestamps == 50362
    assert s.timestamp_begin == 50363
    assert s.n_vocab == 51864
    assert s.sot_sequence() == (50257,)


def test_special_token_layout_multilingual():
    s = SpecialTokens.for_model(english=False)
    assert s.eot == 50257 and s.sot == 50258 and s.n_vocab == 51865


def test_byte_unicode_map_bijective():
    m = _byte_unicode_map()
    assert len(m) == 256 and len(set(m.values())) == 256


def _toy_tokenizer():
    b2u = _byte_unicode_map()

    def u(s):
        return "".join(b2u[b] for b in s.encode())

    # Vocabulary: all single mapped bytes + a few merged tokens.
    vocab = {ch: i for i, ch in enumerate(sorted(set(b2u.values())))}
    nxt = len(vocab)
    for tok in [u("he"), u("ll"), u("hell"), u("hello"), u(" w"), u(" wo")]:
        vocab[tok] = nxt
        nxt += 1
    merges = [(u("h"), u("e")), (u("l"), u("l")), (u("he"), u("ll")),
              (u("hell"), u("o")), (u(" "), u("w")), (u(" w"), u("o"))]
    return BPETokenizer(vocab, merges, english=True)


def test_bpe_roundtrip_and_merging():
    tok = _toy_tokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    # "hello" must have merged into a single token.
    b2u = _byte_unicode_map()
    hello_id = tok.vocab["".join(b2u[b] for b in b"hello")]
    assert ids[0] == hello_id


def test_bpe_decode_skips_specials():
    tok = _toy_tokenizer()
    ids = tok.encode("hello") + [tok.specials.eot, tok.specials.sot]
    assert tok.decode(ids) == "hello"


def test_byte_fallback_roundtrip():
    tok = ByteFallbackTokenizer()
    text = "a tiny test, with punctuation!"
    ids = tok.encode(text)
    assert tok.decode(ids + [tok.specials.eot]) == text
    assert tok.specials.n_vocab == 51864


def test_non_speech_tokens_from_vocab():
    from clearconverse_tpu.models.tokenizer import non_speech_tokens
    tok = _toy_tokenizer()
    ids = non_speech_tokens(tok)
    # Single-char symbols present in the byte-level vocab get suppressed.
    assert tok.vocab["".join([_byte_unicode_map()[ord("#")]])] in ids
    assert len(ids) > 5


def test_non_speech_tokens_byte_fallback_empty():
    from clearconverse_tpu.models.tokenizer import non_speech_tokens
    assert non_speech_tokens(ByteFallbackTokenizer()) == ()


def test_load_tokenizer_from_vocab_files(tmp_path):
    """HF-format vocab.json + merges.txt load into a working BPETokenizer."""
    import json
    from clearconverse_tpu.models.tokenizer import load_tokenizer

    b2u = _byte_unicode_map()

    def u(s):
        return "".join(b2u[b] for b in s.encode())

    vocab = {ch: i for i, ch in enumerate(sorted(set(b2u.values())))}
    vocab[u("he")] = len(vocab)
    vocab[u("llo")] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n"
        f"{u('h')} {u('e')}\n"
        f"{u('l')} {u('l')}\n"
        f"{u('ll')} {u('o')}\n")
    tok = load_tokenizer(str(tmp_path), english=True)
    from clearconverse_tpu.models.tokenizer import BPETokenizer
    assert isinstance(tok, BPETokenizer)
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    # "he" merged; "llo" via ll+o merge.
    assert ids[0] == vocab[u("he")]


def test_load_tokenizer_fallback_when_missing(tmp_path):
    from clearconverse_tpu.models.tokenizer import (ByteFallbackTokenizer,
                                                    load_tokenizer)
    assert isinstance(load_tokenizer(str(tmp_path)), ByteFallbackTokenizer)
    assert isinstance(load_tokenizer(None), ByteFallbackTokenizer)


def test_language_tokens_and_v3_layout():
    """Multilingual layouts: 99-language (v1/v2) and 100-language (v3)
    special tables, language-token lookup in whisper's canonical order."""
    import pytest

    sp99 = SpecialTokens.for_model(english=False)
    assert not sp99.english_only
    assert SpecialTokens.for_model(english=True).english_only
    assert sp99.language_token("en") == sp99.sot + 1 == 50259
    assert sp99.language_token("zh") == 50260
    assert sp99.sot_sequence(sp99.language_token("de")) == (
        50258, 50261, sp99.transcribe)
    with pytest.raises(ValueError):
        sp99.language_token("yue")          # needs the v3 100-language table

    sp100 = SpecialTokens.for_model(english=False, n_languages=100)
    assert sp100.language_token("yue") == sp100.sot + 1 + 99
    # Every later special shifts by one in the v3 layout.
    assert sp100.transcribe == sp99.transcribe + 1
    assert sp100.timestamp_begin == sp99.timestamp_begin + 1
    assert sp100.n_vocab == 51866
