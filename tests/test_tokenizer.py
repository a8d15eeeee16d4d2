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
