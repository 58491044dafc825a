"""WordPiece greedy-kernel unit tests: maximal munch preference, the
whole-word [UNK] contract, reassembly invariant, and vocabulary membership
(no Ray needed — the kernel is the per-distinct-word hot loop of
docs_wordpiece_encode)."""

from __future__ import annotations

import pytest

from mix_blink_ray.stages.bpe import (
    WORDPIECE_CONT,
    WORDPIECE_INITIAL,
    wordpiece_greedy,
    wordpiece_tables,
)

INIT_T, CONT_T = wordpiece_tables()


def enc(w):
    return wordpiece_greedy(w, INIT_T, CONT_T)


def test_maximal_munch_and_continuations():
    assert enc("scan") == ["sca", "##n"]          # 'sca' beats 's'
    assert enc("stream") == ["st", "##ream"]      # multi-char continuation
    assert enc("window") == ["wind", "##o", "##w"]
    assert enc("batch") == ["batch"]              # whole-word piece
    assert enc("batches") == ["batch", "##e", "##s"]
    assert enc("a") == ["a"]


def test_whole_word_unk():
    # 'v' is word-initial-only-missing: both fail at position 0.
    assert enc("vector") is None
    assert enc("value") is None
    # but 'v' mid-word is fine (continuation table has all 26 letters)
    assert enc("have") == ["h", "##a", "##v", "##e"]


def test_reassembly_and_membership():
    init = set(WORDPIECE_INITIAL)
    cont = set(WORDPIECE_CONT)
    for w in ["scan", "stream", "window", "sort", "batches", "quux", "zigzag"]:
        ps = enc(w)
        assert ps is not None
        assert "".join(p.removeprefix("##") for p in ps) == w
        assert not ps[0].startswith("##")
        assert ps[0] in init
        for p in ps[1:]:
            assert p.startswith("##") and p.removeprefix("##") in cont


def test_empty_word_is_zero_pieces():
    assert enc("") == []
