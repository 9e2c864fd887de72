-- Nearest-neighbor join through the same SQL text as q1: under
-- CoitreesNearest the range-predicate join returns, for each probe row,
-- its nearest row from the other table instead of all overlapping
-- pairs — the reference's algorithm-switch contract.
-- Run:  sequila-spark -f queries/q2_nearest.sql
SET sequila.prefer_interval_join TO true;
SET sequila.interval_join_algorithm TO CoitreesNearest;

CREATE EXTERNAL TABLE targets (contig VARCHAR NOT NULL, start BIGINT NOT NULL, end BIGINT NOT NULL)
STORED AS CSV
LOCATION '../testing/data/targets_demo.bed'
OPTIONS ('delimiter' '\t', 'has_header' 'false');

CREATE EXTERNAL TABLE reads (contig VARCHAR NOT NULL, start BIGINT NOT NULL, end BIGINT NOT NULL)
STORED AS CSV
LOCATION '../testing/data/reads_demo.bed'
OPTIONS ('delimiter' '\t', 'has_header' 'false');

-- nearest SQL mode returns the joined rows (SELECT * contract); the
-- SECOND table is the probe side — each read appears exactly once with
-- its nearest target (overlapping first, then smallest gap)
SELECT * FROM targets t JOIN reads r
  ON t.contig = r.contig
 AND t.end >= r.start
 AND t.start <= r.end;
