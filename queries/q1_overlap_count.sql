-- The reference's headline q1 shape (cf. reference queries/q1-coitrees.sql:
-- session knobs + two BED externals + the range-predicate count join),
-- phrased for this engine and pointed at the shipped demo data.
-- Run:  sequila-spark -f queries/q1_overlap_count.sql
SET sequila.prefer_interval_join TO true;
SET sequila.interval_join_algorithm TO coitrees;

CREATE EXTERNAL TABLE targets (contig VARCHAR NOT NULL, start BIGINT NOT NULL, end BIGINT NOT NULL)
STORED AS CSV
LOCATION '../testing/data/targets_demo.bed'
OPTIONS ('delimiter' '\t', 'has_header' 'false');

CREATE EXTERNAL TABLE reads (contig VARCHAR NOT NULL, start BIGINT NOT NULL, end BIGINT NOT NULL)
STORED AS CSV
LOCATION '../testing/data/reads_demo.bed'
OPTIONS ('delimiter' '\t', 'has_header' 'false');

-- the front-end recognizes the range predicate and plans the binned
-- equi-join, never the per-contig nested loop
SELECT count(1) AS n_pairs FROM targets t JOIN reads r
  ON t.contig = r.contig
 AND t.end >= r.start
 AND t.start <= r.end;
