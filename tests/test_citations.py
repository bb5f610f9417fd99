"""insert_citations parity fixtures (rag/nlp/search.py:158-245)."""

import numpy as np

from ragflow_core16_ray.functions.citations import (insert_citations,
                                                    split_answer_pieces)


def test_boundary_reattach_and_short_piece_filter():
    ans = "The hash table scan is fast. It reads buckets in order."
    chunks = ["hash table scan reads buckets in bucket order fast",
              "weather report for tomorrow and the day after"]
    out, cited = insert_citations(ans, chunks)
    # the boundary's first char re-attaches ('fas'+'t'), the marker goes
    # between the piece and its punctuation — the reference's layout
    assert " ##0$$" in out
    assert out.startswith("The hash table scan is fast ##0$$.")
    assert cited == {0}
    # the unrelated chunk is never cited
    assert "##1$$" not in out


def test_code_fence_kept_whole():
    ans = "Intro sentence here. ```code\nfence block```\nTail sentence."
    pieces = split_answer_pieces(ans)
    assert any(p.startswith("```") and p.endswith("\n") for p in pieces)


def test_threshold_ladder_reaches_weak_matches():
    # mid-strength match (hybrid sim ≈ 0.45): the 0.63 rung misses, a
    # later ×0.8 rung cites; a too-weak match (< the 0.3 floor) never
    # cites
    ans = "gamma delta epsilon zeta."
    out, cited = insert_citations(
        ans, ["gamma delta filler words padding", "totally different"])
    assert cited == {0}
    out, cited = insert_citations(
        ans, ["gamma unrelated filler words padding", "totally different"])
    assert cited == set()


def test_no_chunks_and_no_pieces():
    assert insert_citations("whatever", []) == ("whatever", set())
    out, cited = insert_citations("abc.", ["some chunk text"])
    assert cited == set()  # every piece < 5 chars
    assert out == "abc."


def test_each_chunk_cited_once_and_cap_four():
    ans = ("alpha beta gamma delta common tokens. "
           "alpha beta gamma delta common tokens again.")
    chunks = ["alpha beta gamma delta common tokens"] * 6
    out, cited = insert_citations(ans, chunks)
    # ≤4 citations per piece, and a chunk id never repeats in the text
    for c in cited:
        assert out.count(f"##{c}$$") == 1
    assert all(len(seg.split("$$")) <= 6 for seg in out.split("."))


def test_insert_citations_fuzz():
    """Arbitrary answer/chunk text: never crashes, output text equals
    the input plus well-formed ' ##i$$' markers, cited ids in range,
    each cited at most once."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(min_codepoint=9, max_codepoint=0x2FFF),
        max_size=200)

    @settings(max_examples=60, deadline=None)
    @given(ans=text, chunks=st.lists(text, max_size=4))
    def run(ans, chunks):
        out, cited = insert_citations(ans, chunks)
        assert cited <= set(range(len(chunks)))
        stripped = re.sub(r" ##\d+\$\$", "", out)
        # removing markers recovers the original answer — unless the
        # answer itself contains marker-shaped text, which the regex
        # would also strip
        if not re.search(r" ##\d+\$\$", ans):
            assert stripped == ans
        ids = re.findall(r" ##(\d+)\$\$", out)
        assert len(ids) == len(set(ids))

    run()
