"""Contract tests for tools/gen_testdata.py — CI regenerates the testdata
from this script, so schema or structure drift here silently breaks every
downstream CI check. Pins: exact schemas vs the documented layout, the
row-count laws, determinism, key referential bounds, and the two
measured-from-driver-data structural properties (near-dup band in
documents, isotropic embeddings)."""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from _testdata import SF0_001

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
from tools.gen_testdata import gen_sf  # noqa: E402


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("gen") / "sf0.001"
    gen_sf(str(out), 0.001)
    return str(out)


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def test_schemas_match_driver_data(gen_dir):
    for t in TABLES:
        got = pq.read_table(f"{gen_dir}/{t}.parquet")
        want = pq.read_table(f"{SF0_001}/{t}.parquet")
        assert got.schema.remove_metadata().equals(
            want.schema.remove_metadata()), t
        assert got.num_rows == want.num_rows, t


def test_deterministic(gen_dir, tmp_path):
    out2 = tmp_path / "again"
    gen_sf(str(out2), 0.001)
    for t in ("lineitem", "documents", "embeddings"):
        a = pq.read_table(f"{gen_dir}/{t}.parquet")
        b = pq.read_table(f"{out2}/{t}.parquet")
        assert a.equals(b), t


def test_referential_bounds(gen_dir):
    li = pq.read_table(f"{gen_dir}/lineitem.parquet")
    orders = pq.read_table(f"{gen_dir}/orders.parquet")
    part = pq.read_table(f"{gen_dir}/part.parquet")
    cust = pq.read_table(f"{gen_dir}/customer.parquet")
    assert max(li["l_orderkey"].to_pylist()) < orders.num_rows
    assert max(li["l_partkey"].to_pylist()) < part.num_rows
    assert max(orders["o_custkey"].to_pylist()) < cust.num_rows


def test_documents_near_dup_band(gen_dir):
    """The dedup operators' tests need real candidate pairs: some docs
    must sit HIGH in the shingle-Jaccard band (driver data: ~28 pairs
    >= 0.5 at sf0.001, none marginal enough to split the MinHash
    families)."""
    texts = [t.split() for t in
             pq.read_table(f"{gen_dir}/documents.parquet")["text"].to_pylist()]

    def shingles(t):
        return {tuple(t[i:i + 5]) for i in range(len(t) - 4)}

    S = [shingles(t) for t in texts]
    high = sum(1 for i in range(len(S)) for j in range(i + 1, len(S))
               if S[i] & S[j]
               and len(S[i] & S[j]) / len(S[i] | S[j]) >= 0.8)
    assert high >= 5, f"only {high} high-Jaccard pairs — dedup tests need more"


def test_embeddings_isotropic_no_near_dups(gen_dir):
    """ANN recall pins were measured on isotropic embeddings (driver data:
    max pairwise cos ~0.5, label uncorrelated with direction)."""
    t = pq.read_table(f"{gen_dir}/embeddings.parquet")
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    C = V @ V.T
    np.fill_diagonal(C, -1)
    assert C.max() < 0.7, f"near-dup vectors present (max cos {C.max():.3f})"
    L = np.array(t["label"].to_pylist())
    m = min(200, len(V))
    intra = np.mean([C[i, j] for i in range(m) for j in range(i + 1, m)
                     if L[i] == L[j]])
    assert abs(intra) < 0.05, f"labels cluster directions (intra {intra:.3f})"
