"""BPE learn/encode kernels — pure-python unit tests (no Ray session).

The merge sequence for the classic corpus {low:5, lower:2, newest:6,
widest:3} (Sennrich et al. 2016 §3.2's worked example, adapted to our
end-of-word fusing) is derived by hand in the assertions below.
"""

import numpy as np

from cqi_ray.ops.bpe import (EOW, WordEncoder, encode_word, learn_merges,
                             word_to_symbols)

CORPUS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_word_to_symbols():
    assert word_to_symbols("low") == ("l", "o", "w" + EOW)
    assert word_to_symbols("a") == ("a" + EOW,)
    assert word_to_symbols("") == ()


def test_learn_merges_classic_sequence():
    merges = learn_merges(CORPUS, num_merges=5)
    got = [(m[1], m[2], m[3], m[4]) for m in merges]
    # hand-derived: (e,s)=9 ties (s,t</w>)=9 -> lexicographic min wins
    assert got[0] == ("e", "s", "es", 9)
    assert got[1] == ("es", "t" + EOW, "est" + EOW, 9)
    assert got[2] == ("l", "o", "lo", 7)
    # (e,w)=6 ties (n,e)=6 and (w,est</w>)=6 -> ("e","w") is the lex min
    assert got[3] == ("e", "w", "ew", 6)
    # (ew,est</w>)=6 ties (n,ew)=6 -> ("ew",...) < ("n",...)
    assert got[4] == ("ew", "est" + EOW, "ewest" + EOW, 6)
    # ranks are 0..4 in order
    assert [m[0] for m in merges] == list(range(5))


def test_encode_word_applies_ranks_in_order():
    merges = learn_merges(CORPUS, num_merges=5)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    # unseen word built from learned subwords: rank0 es, rank1 est</w>,
    # rank2 lo apply; rank3 (e,w) no longer has an 'e' to bind
    assert encode_word("lowest", ranks) == ("lo", "w", "est" + EOW)
    # in-vocab word reproduces its training segmentation
    assert encode_word("newest", ranks) == ("n", "ewest" + EOW)
    assert encode_word("low", ranks) == ("lo", "w" + EOW)
    # fully out-of-vocab falls back to chars
    assert encode_word("zq", ranks) == ("z", "q" + EOW)


def test_word_encoder_stats_and_cache():
    merges = learn_merges(CORPUS, num_merges=5)
    enc = WordEncoder({(m[1], m[2]): m[0] for m in merges})
    n_tok, n_typ = enc.doc_stats(["low lowest low", ""])
    # low -> 2 pieces (x2 words), lowest -> 3 pieces
    assert n_tok.tolist() == [7, 0]
    # types: {lo, w</w>, w, est</w>}
    assert n_typ.tolist() == [4, 0]
    assert n_tok.dtype == np.int64
    assert "low" in enc.cache and "lowest" in enc.cache


def test_learn_merges_deterministic_vs_input_order():
    a = learn_merges(CORPUS, num_merges=5)
    b = learn_merges(list(reversed(CORPUS)), num_merges=5)
    assert a == b


def test_learn_merges_exhausts_gracefully():
    # single one-char word: no pairs ever
    assert learn_merges([("a", 3)], num_merges=4) == []
    # two-char word exhausts after one merge
    m = learn_merges([("ab", 2)], num_merges=10)
    assert len(m) == 1 and m[0][3] == "ab" + EOW
