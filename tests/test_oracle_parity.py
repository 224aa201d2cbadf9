"""In-suite guard for the driver contract: a fast subset of the
queries()/oracle_sql() comparisons at sf0.001 (the full gate over every query is
tools/oracle_check.py at sf0.01)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import value_hash

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "token_count",
    "minhash_signature",
    "minhash_band_pairs",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    "doc_fingerprint",
    "embedding_cosine_topk",
    "simhash128_signature",
    "bpe_token_estimate",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    orows = duck.execute(entrymod.oracle_sql()[name]).df().to_dict("records")
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    assert value_hash(srows) == value_hash(orows), f"{name}: value hash mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "component", "cluster_size"}
