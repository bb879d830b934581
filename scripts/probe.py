import duckdb
con = duckdb.connect()
tests = [
    "md5_number('a')",
    "md5_number_lower('a')",
    "md5_number_upper('a')",
    "hash('a')",
    "sha256('a')",
    "md5('a')",
    "list_reduce([1,2,3], (a,b) -> a+b)",
    "time_bucket(INTERVAL '1 hour', TIMESTAMP '2024-01-01 01:30:00')",
    "string_split_regex('a b  c', ' +')",
    "length(regexp_replace('hello world','[a-z]','','g'))",
    "greatest(1,2,3)",
    "bit_count(255::BIGINT)",
    "xor(5::BIGINT, 3::BIGINT)",
    "(5::BIGINT # 3::BIGINT)",
    "(1::BIGINT << 3)",
    "(255::BIGINT >> 2)",
    "(255::BIGINT & 12)",
    "(1::BIGINT | 2)",
    "list_sort([3,1,2])",
    "list_slice([1,2,3,4],1,2)",
    "strpos('hello','ll')",
    "to_hex(255)",
]
for t in tests:
    try:
        print(t, '=>', con.execute('SELECT ' + t).fetchone())
    except Exception as e:
        print(t, 'FAIL:', str(e).split(chr(10))[0][:100])
