

def _brute_spans(texts, win):
    """Reference duplicate-span intervals: dict doc -> [(s, e, nw)]."""
    from collections import defaultdict

    owners = defaultdict(set)
    for did, t in texts.items():
        for off in range(len(t) - win + 1):
            owners[t[off : off + win]].add(did)
    hits = defaultdict(list)
    for did, t in texts.items():
        for off in range(len(t) - win + 1):
            if len(owners[t[off : off + win]]) >= 2:
                hits[did].append(off)
    out = {}
    for did, offs in hits.items():
        spans = []
        start = prev = offs[0]
        n = 1
        for o in offs[1:]:
            if o == prev + 1:
                prev = o
                n += 1
            else:
                spans.append((start, prev + win, n))
                start = prev = o
                n = 1
        spans.append((start, prev + win, n))
        out[did] = spans
    return out


def test_duplicate_spans_matches_bruteforce(spark):
    """Random template corpus: shared templates produce cross-doc spans,
    unique suffixes break them — intervals must equal the brute force."""
    import random

    from simkit_spark.functions.dedup import duplicate_spans

    rng = random.Random(31)
    templates = ["the quick brown fox jumps over the lazy dog", "lorem ipsum dolor sit amet consectetur"]
    texts = {}
    for i in range(30):
        t = rng.choice(templates)
        texts[i] = (
            "".join(rng.choice("abcdefg ") for _ in range(rng.randrange(0, 12)))
            + t
            + "".join(rng.choice("hijklmn ") for _ in range(rng.randrange(0, 12)))
        )
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    win = 12
    got = {}
    for r in duplicate_spans(df, win=win).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_windows"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    want = {k: sorted(v) for k, v in _brute_spans(texts, win).items()}
    assert got == want and len(want) > 0


def test_duplicate_spans_cross_doc_only_and_partition_invariant(spark):
    from simkit_spark.functions.dedup import duplicate_spans

    rows = [
        (0, "zzzz REPEATED BLOCK REPEATED BLOCK zzzz"),  # within-doc only
        (1, "unique text that shares nothing with anyone at all"),
        (2, "xx SHARED WINDOW CONTENT xx"),
        (3, "yy SHARED WINDOW CONTENT yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, win=10).collect()
    docs = {r["doc_id"] for r in out}
    assert docs == {2, 3}  # within-doc repeat (0) and unique (1) excluded
    a = sorted(map(tuple, out))
    b = sorted(map(tuple, duplicate_spans(df.repartition(7), win=10).collect()))
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        duplicate_spans(df, win=0)
