"""Jaro-Winkler pair kernel: bit-exact differential vs DuckDB's
jaro_winkler_similarity (the oracle function), plus textbook cases."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_textbook_values():
    from deekseek_ocr___dockerized_api_ray.functions.jaro import jaro_winkler_pairs

    a = ["MARTHA", "DWAYNE", "DIXON", "CRATE", "ab", "", "abc"]
    b = ["MARHTA", "DUANE", "DICKSONX", "TRACE", "ba", "", "abc"]
    got = jaro_winkler_pairs(a, b)
    want = [0.9611111111111111, 0.8400000000000001, 0.8133333333333332,
            0.7333333333333334, 0.0, 0.0, 1.0]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # jaro (no winkler boost) for the boosted cases
    j = jaro_winkler_pairs(a, b, winkler=False)
    np.testing.assert_allclose(j[:3], [0.9444444444444445,
                                       0.8222222222222223,
                                       0.7666666666666666], rtol=0, atol=0)


def test_bit_exact_vs_duckdb_random():
    """5k random pairs (incl. empties, repeats, spaces): every double
    must equal DuckDB's -- this is what lets the operator threshold on
    raw values with no rounding guard."""
    import random

    import duckdb

    from deekseek_ocr___dockerized_api_ray.functions.jaro import jaro_winkler_pairs

    rng = random.Random(7)
    alpha = "abcdefg "
    pairs = [("".join(rng.choice(alpha) for _ in range(rng.randint(0, 14))),
              "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14))))
             for _ in range(5000)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)",
                    [(i, a, b) for i, (a, b) in enumerate(pairs)])
    ref = np.array([r[0] for r in con.execute(
        "SELECT jaro_winkler_similarity(a,b) FROM t ORDER BY i").fetchall()])
    got = jaro_winkler_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    assert (got == ref).all()


@needs_data
def test_part_name_jw_pairs_blocking(ray_session):
    """Pairs only within first-word blocks, all >= threshold, a<b,
    and exactly the DuckDB cross-block result (full parity is swept in
    test_entry)."""
    from deekseek_ocr___dockerized_api_ray.pipelines.text import part_name_jw_pairs

    df = part_name_jw_pairs(SF).to_pandas()
    assert len(df) > 0
    assert (df["jw"] >= 0.85).all()
    assert (df["name_a"] < df["name_b"]).all()
    fw = df["name_a"].str.split(" ").str[0]
    assert (fw == df["name_b"].str.split(" ").str[0]).all()
