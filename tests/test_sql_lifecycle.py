"""SQL DDL + INSERT-SELECT lifecycle (SURVEY.md §3.1).

The reference's Table-API entry point is `CREATE TABLE ... WITH (...)` then
`INSERT INTO ... SELECT ...` (format/.../debezium_json/MySqlCDC2Print.java:
19-55). Spark analog: CREATE TABLE ... USING parquet + INSERT INTO ...
SELECT through the session catalog — verified end-to-end here, including
schema declaration, projection into the narrower sink schema (Csv2Csv.java:
41-48 shape), and reading the result back.
"""

from pyspark.sql import functions as F


def test_ddl_insert_select_roundtrip(spark, sf_dir, tmp_path):
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders_src")
    loc = str(tmp_path / "orders_sink")
    spark.sql(f"""
        CREATE TABLE orders_sink (
            o_orderkey BIGINT,
            o_totalprice DOUBLE,
            priority STRING
        ) USING parquet LOCATION '{loc}'
    """)
    try:
        spark.sql("""
            INSERT INTO orders_sink
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders_src WHERE o_orderstatus = 'O'
        """)
        got = spark.sql("SELECT COUNT(*) AS n FROM orders_sink").head()["n"]
        want = spark.table("orders_src").filter(F.col("o_orderstatus") == "O").count()
        assert got == want > 0
        # the sink is narrower than the source — schema declared by DDL wins
        assert [f.name for f in spark.table("orders_sink").schema.fields] == \
            ["o_orderkey", "o_totalprice", "priority"]
        # INSERT is append (second insert doubles)
        spark.sql("""
            INSERT INTO orders_sink
            SELECT o_orderkey, o_totalprice, o_orderpriority
            FROM orders_src WHERE o_orderstatus = 'O'
        """)
        assert spark.sql("SELECT COUNT(*) AS n FROM orders_sink").head()["n"] == 2 * want
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_sink")
