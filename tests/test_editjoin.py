"""edit1_pairs: deletion-neighborhood candidates are COMPLETE for
Levenshtein distance <= 1 (brute-force parity), distance-2 pairs are
verified away, hot variants are capped, and output is
partition-invariant."""

from __future__ import annotations

from simkit_spark.functions.editjoin import edit1_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, max_len):
    keys = {i: k[:max_len] for i, k in rows if k[:max_len]}
    out = set()
    for a in keys:
        for b in keys:
            if a < b and _lev(keys[a], keys[b]) <= 1:
                out.add((a, b, keys[a], keys[b], _lev(keys[a], keys[b])))
    return out


def test_edit1_matches_bruteforce(spark):
    rows = [
        ("a", "spark"), ("b", "spark"), ("c", "spork"),   # 0 and 1 (sub)
        ("d", "sparks"), ("e", "park"),                   # 1 (ins/del)
        ("f", "spoon"), ("g", "zzzzz"), ("h", ""),        # far / empty
        ("i", "s"), ("j", "t"), ("k", "st"),              # short strings
        ("l", "a very much longer key that gets truncated"),
        ("m", "a very much longer key that gets TRUNCATED ELSEWHERE"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["src"], r["dst"], r["src_key"], r["dst_key"], r["dist"])
        for r in edit1_pairs(df, "text", max_len=24).collect()
    }
    assert got == _brute(rows, 24)
    # l/m share their 24-char truncation exactly -> must appear at dist 0
    assert ("l", "m", rows[11][1][:24], rows[11][1][:24], 0) in got
    got2 = {
        tuple(r)
        for r in edit1_pairs(df.repartition(7), "text", max_len=24).collect()
    }
    assert got2 == got


def test_edit1_distance2_rejected_and_cap(spark):
    rows = [("a", "abcd"), ("b", "abef"), ("c", "abcf")]  # a-b dist 2
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {(r["src"], r["dst"]) for r in edit1_pairs(df, "text").collect()}
    assert got == {("a", "c"), ("b", "c")}
    # cap: 5 identical keys share every variant; max_bucket=2 drops all
    # their buckets -> no pairs survive (loud-degrade contract)
    same = [(str(i), "hot") for i in range(5)]
    df2 = spark.createDataFrame(same, "doc_id string, text string")
    assert edit1_pairs(df2, "text", max_bucket=2).count() == 0
    assert edit1_pairs(df2, "text", max_bucket=100).count() == 10
