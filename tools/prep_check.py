#!/usr/bin/env python3
"""Stage-wise DuckDB adjudication of TrainingPrep.runV2 at scale.

Usage: python3 tools/prep_check.py <stageOutDir> <sfDir> [threads]

Each stage's DuckDB replay reads the PREVIOUS stage's Spark parquet
dump as a pre-staged input (the r8 bounded-replay recipe), so no
statement carries the whole cascade:

  stage0 (span excision)      : documents            -> stage0
  stage1 (decontamination)    : stage0               -> stage1
  stage2 (gated cosine drop)  : stage1 (+ raw count) -> stage2
  final  (clean+mix+chunk)    : stage2               -> final

A PASS on every row adjudicates the composition: each arrow is the
exact SQL fragment of the committed monolithic oracle, split at its
MATERIALIZED boundaries. Dev harness only — not part of the library.
"""
import os, sys, time, glob
import duckdb
import pandas as pd

out = sys.argv[1]
sf = sys.argv[2]
threads = int(sys.argv[3]) if len(sys.argv) > 3 else 0

MH = ", ".join(f"min(md5('{i}|' || shingle)) AS mh{i}" for i in range(8))
BANDS = lambda src: " UNION ALL ".join(
    f"SELECT doc_id, {i} AS band, md5(mh{i}) AS bucket FROM {src}" for i in range(8))

STAGES = [
    ("stage0", f"""
      WITH w0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      occ AS MATERIALIZED (SELECT doc_id,
                     unnest(range(1, greatest(len(w) - 14, 0) + 1)) AS i,
                     unnest(list_transform(range(1, greatest(len(w) - 14, 0) + 1),
                            i -> CAST('0x' || substring(md5(array_to_string(w[i:i+14], ' ')), 1, 15) AS BIGINT))) AS h
              FROM w0),
      kk AS (SELECT h, count(*) AS n_occ, min(doc_id * 1000000 + i) AS keeper
             FROM occ GROUP BY h),
      cut AS (SELECT doc_id, list(i) AS cuts
              FROM occ JOIN kk USING (h)
              WHERE kk.n_occ > 1 AND occ.doc_id * 1000000 + occ.i <> kk.keeper
              GROUP BY doc_id),
      exc AS (SELECT t.doc_id,
                     coalesce(array_to_string(list_transform(keep, p -> t.w[p]), ' '), '') AS text
              FROM (SELECT w0.doc_id, w0.w,
                           list_filter(range(1, len(w0.w) + 1),
                             p -> len(list_filter(coalesce(c.cuts, []),
                                    s -> p >= s AND p <= s + 14)) = 0) AS keep
                    FROM w0 LEFT JOIN cut c USING (doc_id)) t)
      SELECT e.doc_id, e.text, d.lang FROM exc e JOIN documents d USING (doc_id)"""),
    ("stage1", """
      WITH words2 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM s0),
      sh8 AS MATERIALIZED (SELECT DISTINCT doc_id,
                     CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
              FROM (SELECT doc_id,
                           unnest(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
                                  i -> array_to_string(w[i:i+7], ' '))) AS shingle
                    FROM words2)),
      bench AS (SELECT DISTINCT h FROM sh8 WHERE doc_id < 50),
      cont AS (SELECT DISTINCT s.doc_id FROM sh8 s JOIN bench b USING (h)
               WHERE s.doc_id >= 50)
      SELECT * FROM s0
      WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM cont)"""),
    ("stage2", f"""
      WITH shdec AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM (
              SELECT doc_id,
                     unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                            i -> array_to_string(w[i:i+2], ' '))) AS shingle
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s1))),
      mhdec AS (SELECT doc_id, {MH} FROM shdec GROUP BY doc_id),
      bdec AS ({BANDS('mhdec')}),
      cdec AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bdec a JOIN bdec b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      wt0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM s1),
      tfx AS MATERIALIZED (SELECT doc_id, t, count(*) AS tf FROM wt0 GROUP BY 1, 2),
      nraw AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      ndec AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
      dfr AS (SELECT t, count(*) AS df FROM tfx GROUP BY t
              HAVING count(*) <= (SELECT n FROM nraw) // 10),
      wt AS MATERIALIZED (SELECT doc_id, tfx.t,
                    tfx.tf * (CAST((SELECT n FROM ndec) AS DOUBLE) / CAST(dfr.df AS DOUBLE)) AS wgt
             FROM tfx JOIN dfr ON dfr.t = tfx.t),
      nr AS MATERIALIZED (SELECT doc_id, sqrt(CAST(sum(CAST(wgt * wgt AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
             FROM wt GROUP BY doc_id),
      pp AS MATERIALIZED (SELECT c.id_a, c.id_b,
                    CAST(sum(CAST(a.wgt * b.wgt AS DECIMAL(38,18))) AS DOUBLE) AS dotp
             FROM cdec c
             JOIN wt a ON a.doc_id = c.id_a
             JOIN wt b ON b.doc_id = c.id_b AND b.t = a.t
             GROUP BY 1, 2),
      ndrop AS (SELECT DISTINCT id_b AS doc_id FROM pp
                JOIN nr na ON na.doc_id = pp.id_a
                JOIN nr nb ON nb.doc_id = pp.id_b
                WHERE dotp / (na.nrm * nb.nrm) >= 0.3)
      SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)"""),
    ("final", f"""
      WITH survivors AS MATERIALIZED (
        SELECT d.* FROM s2 d
        JOIN (SELECT min(doc_id) AS doc_id FROM s2 GROUP BY sha256(text)) k2
          ON d.doc_id = k2.doc_id),
      wordsS AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM survivors),
      shS AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                     i -> array_to_string(w[i:i+2], ' '))) AS shingle
        FROM wordsS)),
      mh AS MATERIALIZED (SELECT doc_id, {MH} FROM shS GROUP BY doc_id),
      bands AS MATERIALIZED ({BANDS('mh')}),
      dropped AS (
        SELECT DISTINCT b.doc_id FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      kept AS MATERIALIZED (SELECT * FROM survivors WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
      quality AS MATERIALIZED (
        SELECT doc_id, text, lang FROM kept
        WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000
          AND CAST(len(list_filter(string_split(text, ' '),
                       t -> list_contains(['the','a','of','and','to','in','is','for'], t))) AS DOUBLE)
                / len(string_split(text, ' ')) >= 0.02),
      mixed AS MATERIALIZED (
        SELECT doc_id, text FROM quality
        WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
              < CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 80 ELSE 100 END),
      ranked AS (
        SELECT doc_id,
               CAST(row_number() OVER (
                 ORDER BY md5('prep|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                 AS shuffle_rank
        FROM mixed),
      rw AS MATERIALIZED (SELECT m.doc_id, r.shuffle_rank, string_split(m.text, ' ') AS w
             FROM mixed m JOIN ranked r ON m.doc_id = r.doc_id),
      st AS (SELECT doc_id, shuffle_rank, w,
                    unnest(range(1, greatest(len(w), 1) + 1, 128)) AS s
             FROM rw)
      SELECT doc_id, shuffle_rank, CAST((s - 1) // 128 AS BIGINT) AS chunk_id,
             array_to_string(w[s:s + 127], ' ') AS chunk
      FROM st"""),
]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    if threads:
        con.execute(f"SET threads={threads}")
    docs = f"{sf}/documents.parquet"
    if os.path.isdir(docs):  # Spark-written table dir (e.g. ScaleUp's sf10)
        docs = f"{docs}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    names = {"stage0": "s0", "stage1": "s1", "stage2": "s2"}
    n_fail = 0
    for stage, sql in STAGES:
        t0 = time.time()
        exp = con.execute(sql).df()
        files = glob.glob(f"{out}/{stage}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        g, e = canon(got), canon(exp)
        ok = (list(g.columns) == list(e.columns) and len(g) == len(e) and g.equals(e))
        wall = int(time.time() - t0)
        print(f"{'PASS' if ok else 'FAIL'} {stage} ({len(g)} rows) oracle_wall={wall}s", flush=True)
        if not ok:
            n_fail += 1
            print(f"  cols {list(g.columns)} vs {list(e.columns)}; rows {len(g)} vs {len(e)}")
            if list(g.columns) == list(e.columns) and len(g) == len(e):
                neq = (g != e) & ~(g.isna() & e.isna())
                idx = neq.any(axis=1).idxmax()
                print("  got:", {k: str(v)[:80] for k, v in g.loc[idx].to_dict().items()})
                print("  exp:", {k: str(v)[:80] for k, v in e.loc[idx].to_dict().items()})
        # register the SPARK dump as the next stage's pre-staged input
        if stage in names:
            con.execute(f"CREATE VIEW {names[stage]} AS SELECT * FROM read_parquet('{out}/{stage}/*.parquet')")
    print(f"{'ALL-PASS' if n_fail == 0 else f'{n_fail} FAIL'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
