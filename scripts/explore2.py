import duckdb
con = duckdb.connect()
for sf in ['sf0.001','sf0.01','sf0.1']:
    d=f'/root/testdata/{sf}'
    r = con.execute(f"""SELECT (SELECT count(*) FROM '{d}/documents.parquet'),
        (SELECT count(*) FROM '{d}/embeddings.parquet'),
        (SELECT count(*) FROM '{d}/events.parquet'),
        (SELECT count(*) FROM '{d}/lineitem.parquet'),
        (SELECT count(*) FROM '{d}/orders.parquet'),
        (SELECT count(*) FROM '{d}/customer.parquet'),
        (SELECT count(*) FROM '{d}/part.parquet'),
        (SELECT count(*) FROM '{d}/supplier.parquet')""").fetchall()
    print(sf, 'docs,emb,events,li,ord,cust,part,supp:', r)
d='/root/testdata/sf0.01'
print('parts w/o lineitem:', con.execute(f"SELECT count(*) FROM '{d}/part.parquet' p WHERE NOT EXISTS (SELECT 1 FROM '{d}/lineitem.parquet' l WHERE l.l_partkey=p.p_partkey)").fetchone())
# cosine similarity distribution within label blocks
print('cos dist:', con.execute(f"""
 WITH e AS (SELECT * FROM '{d}/embeddings.parquet')
 SELECT max(s), quantile_cont(s, 0.999), quantile_cont(s, 0.99) FROM (
   SELECT list_cosine_similarity(a.embedding, b.embedding) s
   FROM e a JOIN e b ON a.label=b.label AND a.vec_id < b.vec_id)""").fetchone())
print('pairs above 0.8/0.9:', con.execute(f"""
 WITH e AS (SELECT * FROM '{d}/embeddings.parquet')
 SELECT sum(CASE WHEN s>=0.8 THEN 1 ELSE 0 END), sum(CASE WHEN s>=0.9 THEN 1 ELSE 0 END), count(*) FROM (
   SELECT list_cosine_similarity(a.embedding, b.embedding) s
   FROM e a JOIN e b ON a.label=b.label AND a.vec_id < b.vec_id)""").fetchone())
# doc shingle stats: 3-gram shingle doc-frequency
print('shingle df:', con.execute(f"""
 WITH ws AS (SELECT doc_id, string_split(text,' ') w FROM '{d}/documents.parquet'),
 sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] s
        FROM ws, unnest(range(1, len(w)-1)) t(i))
 SELECT count(DISTINCT s), max(df), quantile_cont(df,0.5) FROM (SELECT s, count(*) df FROM sh GROUP BY s) x""").fetchone())
# jaccard pair count at df<=5 candidates
print('jacc cand pairs df<=5:', con.execute(f"""
 WITH ws AS (SELECT doc_id, string_split(text,' ') w FROM '{d}/documents.parquet'),
 sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] s
        FROM ws, unnest(range(1, len(w)-1)) t(i)),
 rare AS (SELECT s FROM (SELECT s, count(*) df FROM sh GROUP BY s) x WHERE df<=5)
 SELECT count(DISTINCT (a.doc_id, b.doc_id)) FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id
 WHERE a.s IN (SELECT s FROM rare)""").fetchone())
