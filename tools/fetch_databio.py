"""Fetch the AIList/databio interval tables behind BASELINE.md's numbers
(VERDICT r10 item 4) so the 0.81x-of-reference claim is reproducible
outside the sandbox on the REAL chainRn4_chr1 ⋈ chainVicPac2_chr1 join
(expected count 154,374,873 — the reference's own correctness anchor,
`sandbox/datafusion_baseline.md:5-27`).

The datasets are the AIList paper's public test data (Feng et al. 2019,
github.com/databio/AIList), the same tables the reference benches
(`sequila/sequila-core/benches/databio_benchmark.rs:148-203`). This
script tries the known public mirrors; if none is reachable (this build
sandbox is offline) it SKIPS with instructions rather than failing —
pass ``--from-dir`` to convert already-downloaded BED/CSV files instead.

Usage::

    python tools/fetch_databio.py OUT_DIR                 # download + convert
    python tools/fetch_databio.py OUT_DIR --from-dir DIR  # convert local BEDs

Writes ``OUT_DIR/{table}.parquet`` with columns
``contig string, pos_start int, pos_end int`` (chr1-only variants get a
``_chr1`` suffix), then ``python bench.py --real-data OUT_DIR`` runs the
verbatim reference query.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile
import urllib.request

# Public mirrors of the AIList test data archive, most-likely first. The
# archive layout: one BED per table (chainRn4.bed, chainVicPac2.bed, ...).
CANDIDATE_URLS = [
    "https://big.databio.org/example_data/AIList/AIListTestData.tgz",
    "https://big.databio.org/open_data/AIList/AIListTestData.tgz",
    "https://cloud.databio.org/AIList/AIListTestData.tgz",
]
TABLES = ["chainRn4", "chainVicPac2"]
EXPECTED_CHR1_COUNT = 154_374_873  # reference correctness anchor


def bed_to_parquet(src: str, out: str, chr1_out: str | None) -> tuple[int, int]:
    """Convert a 3+-column tab BED to parquet (contig, pos_start, pos_end);
    optionally also write the chr1-only slice the published numbers use."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    contigs, starts, ends = [], [], []
    with open(src) as fh:
        for line in fh:
            if not line.strip() or line.startswith(("#", "track", "browser")):
                continue
            f = line.rstrip("\n").split("\t")
            contigs.append(f[0])
            starts.append(int(f[1]))
            ends.append(int(f[2]))
    table = pa.table({
        "contig": contigs,
        "pos_start": pa.array(starts, pa.int32()),
        "pos_end": pa.array(ends, pa.int32()),
    })
    pq.write_table(table, out)
    n1 = 0
    if chr1_out:
        mask = pa.compute.equal(table["contig"], "chr1")
        t1 = table.filter(mask)
        n1 = t1.num_rows
        pq.write_table(t1, chr1_out)
    return table.num_rows, n1


def try_download(dest_dir: str) -> str | None:
    for url in CANDIDATE_URLS:
        try:
            print(f"trying {url} ...", file=sys.stderr)
            with urllib.request.urlopen(url, timeout=30) as resp:
                data = resp.read()
        except Exception as e:  # noqa: BLE001 - any network failure → next
            print(f"  unreachable ({e})", file=sys.stderr)
            continue
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            try:
                tf.extractall(dest_dir, filter="data")
            except TypeError:
                # filter= is a late backport (3.10.12/3.11.4); older
                # patch levels fall back to the classic unfiltered
                # extract with a warning rather than crashing.
                print("  warning: tarfile filter= unsupported on this "
                      "Python patch level; extracting unfiltered",
                      file=sys.stderr)
                tf.extractall(dest_dir)  # noqa: S202 - trusted mirror list
        return dest_dir
    return None


def find_bed(root: str, name: str) -> str | None:
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.lower() in (f"{name.lower()}.bed", f"{name.lower()}.txt",
                             f"{name.lower()}.csv"):
                return os.path.join(dirpath, f)
    return None


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out_dir")
    ap.add_argument("--from-dir", default=None,
                    help="directory already holding the AIList BED files "
                         "(skip the download)")
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    src_root = args.from_dir
    if src_root is None:
        src_root = try_download(os.path.join(args.out_dir, "_raw"))
        if src_root is None:
            print(
                "SKIP: no mirror reachable (offline host?). Download the "
                "AIList test data manually — see github.com/databio/AIList "
                "— then re-run with --from-dir <dir>. Expected files: "
                + ", ".join(f"{t}.bed" for t in TABLES)
            )
            return 0  # graceful skip, not an error

    ok = True
    for t in TABLES:
        bed = find_bed(src_root, t)
        if bed is None:
            print(f"MISSING: {t}.bed not found under {src_root}")
            ok = False
            continue
        n, n1 = bed_to_parquet(
            bed,
            os.path.join(args.out_dir, f"{t}.parquet"),
            os.path.join(args.out_dir, f"{t}_chr1.parquet"),
        )
        print(f"{t}: {n} rows ({n1} on chr1) -> {args.out_dir}")
    if ok:
        print(f"done. Run: python bench.py --real-data {args.out_dir}")
        print(f"expected chr1 join count: {EXPECTED_CHR1_COUNT}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
