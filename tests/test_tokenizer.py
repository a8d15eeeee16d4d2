"""Native BPE tokenizer: native/python parity, roundtrip, greedy-rank
semantics."""

import pytest

from nnop_tpu.runtime.tokenizer import BPETokenizer

# tiny merge table: "ab"->256, "abc"(256+c)->257, "cd"->258
MERGES = [
    (ord("a"), ord("b"), 256),
    (256, ord("c"), 257),
    (ord("c"), ord("d"), 258),
]


def test_encode_greedy_rank():
    tok = BPETokenizer(MERGES)
    # rank order matters: "abcd" -> [ab, c, d] -> [abc, d] (rank 1 < rank 2)
    assert tok.encode("abcd") == [257, ord("d")]
    assert tok.encode("cd") == [258]
    assert tok.encode("xyz") == [ord("x"), ord("y"), ord("z")]
    assert tok.encode("") == []


def test_roundtrip():
    tok = BPETokenizer(MERGES)
    for text in ["abcd", "aabbccdd", "hello abc world cd", "日本語 abc"]:
        assert tok.decode(tok.encode(text)) == text


def test_native_matches_python():
    tok = BPETokenizer(MERGES)
    texts = ["abcdabcdabcd", "ab" * 50 + "cd" * 50, "plain ascii text"]
    for t in texts:
        py = tok._encode_py(t.encode("utf-8"))
        assert tok.encode(t) == py or not tok.native


def test_native_loaded():
    tok = BPETokenizer(MERGES)
    # the native library should build and load in this environment
    assert tok.native, "native tokenizer failed to build/load"


# ---------------------------------------------------------------------------
# Real-format vocabulary (HF tokenizer.json, Llama-3/GPT-2 byte-level BPE)
# ---------------------------------------------------------------------------


def _mini_tokenizer_json(tmp_path):
    """A small but REAL-format tokenizer.json: full 256 byte-token
    alphabet in the GPT-2 byte-unicode space, merges over ASCII and
    multi-byte UTF-8 sequences, and Llama-style special tokens."""
    import json

    from nnop_tpu.runtime.tokenizer import _bytes_to_unicode

    b2u = _bytes_to_unicode()
    vocab = {}
    for b in range(256):
        vocab[b2u[b]] = len(vocab)

    def u(text):
        return "".join(b2u[x] for x in text.encode("utf-8"))

    merges = []

    def add_merge(left, right):
        if left + right not in vocab:
            vocab[left + right] = len(vocab)
        merges.append(f"{left} {right}")

    # ASCII word pieces
    add_merge(u("t"), u("h"))
    add_merge(u("th"), u("e"))
    add_merge(b2u[ord(" ")], u("the"))  # " the" (GPT-2 space prefix)
    # multi-byte: é (2 bytes), 日 (3 bytes), 🚀 (4 bytes)
    for ch in ("é", "日", "🚀"):
        bs = [b2u[x] for x in ch.encode("utf-8")]
        acc = bs[0]
        for piece in bs[1:]:
            add_merge(acc, piece)
            acc += piece
    add_merge(u("日"), u("本")[:1])  # cross-char partial pair is legal

    spec = {
        "model": {"type": "BPE", "vocab": vocab, "merges": merges},
        "added_tokens": [
            {"id": len(vocab), "content": "<|begin_of_text|>"},
            {"id": len(vocab) + 1, "content": "<|end_of_text|>"},
        ],
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(spec))
    return str(path)


def test_tokenizer_json_roundtrip_utf8(tmp_path):
    from nnop_tpu.runtime.tokenizer import VocabBPETokenizer

    tok = VocabBPETokenizer.from_file(_mini_tokenizer_json(tmp_path))
    cases = [
        "the theme",
        "café résumé",
        "日本語のテキスト",
        "mixed 🚀 emoji étude 日本",
        " leading and trailing  ",
        "",
        "🚀🚀🚀",
    ]
    for text in cases:
        ids = tok.encode(text)
        assert tok.decode(ids) == text, text
        # merged multi-byte sequences actually merge (not raw bytes)
        if "🚀" in text:
            rocket_id = None
            b2 = "".join(
                __import__(
                    "nnop_tpu.runtime.tokenizer", fromlist=["_bytes_to_unicode"]
                )._bytes_to_unicode()[b]
                for b in "🚀".encode("utf-8")
            )
            rocket_id = tok.vocab[b2]
            assert rocket_id in ids


def test_tokenizer_json_native_matches_python(tmp_path):
    from nnop_tpu.runtime import tokenizer as T

    tok = T.VocabBPETokenizer.from_file(_mini_tokenizer_json(tmp_path))
    texts = ["the théory 日本 🚀 test", "ascii only words", "ééé"]
    if not tok.native:
        pytest.skip("native core unavailable")
    for text in texts:
        native_ids = tok.encode(text)
        handle = tok._handle
        tok._handle = None  # force the pure-Python path
        py_ids = tok.encode(text)
        tok._handle = handle
        assert native_ids == py_ids, text


def test_tokenizer_json_specials(tmp_path):
    from nnop_tpu.runtime.tokenizer import VocabBPETokenizer

    tok = VocabBPETokenizer.from_file(_mini_tokenizer_json(tmp_path))
    ids = tok.encode("the", add_special=("<|begin_of_text|>",))
    assert ids[0] == tok.special["<|begin_of_text|>"]
    assert tok.decode(ids) == "the"
    assert (
        tok.decode(ids, skip_special=False)
        == "<|begin_of_text|>the"
    )
