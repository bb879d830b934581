import duckdb
con = duckdb.connect()
d='/root/testdata/sf0.01'
# true jaccard over 3-gram shingles for candidate pairs sharing >=1 shingle
print(con.execute(f"""
 WITH ws AS (SELECT doc_id, string_split(text,' ') w FROM '{d}/documents.parquet'),
 sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] s
        FROM ws, unnest(range(1, len(w)-1)) t(i)),
 sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
 common AS (SELECT a.doc_id da, b.doc_id db, count(*) c
            FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
 SELECT max(j), quantile_cont(j,0.999), count(*) FROM (
   SELECT c*1.0/(x.n + y.n - c) j FROM common
   JOIN sz x ON x.doc_id=da JOIN sz y ON y.doc_id=db) t""").fetchone())
# word-level jaccard (1-grams) — vocab 31, so much higher overlap
print(con.execute(f"""
 WITH sh AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) s FROM '{d}/documents.parquet'),
 sz AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
 common AS (SELECT a.doc_id da, b.doc_id db, count(*) c
            FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1,2)
 SELECT max(j), quantile_cont(j,0.99), quantile_cont(j,0.5) FROM (
   SELECT c*1.0/(x.n + y.n - c) j FROM common
   JOIN sz x ON x.doc_id=da JOIN sz y ON y.doc_id=db) t""").fetchone())
