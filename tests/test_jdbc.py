"""S6 JDBC source: real roundtrip against the embedded Derby that ships in
Spark's jars — partitioned read + filter pushdown to the database."""

from pyspark.sql import functions as F

from hiero_spark.sources import readers as rd


def test_jdbc_partitioned_roundtrip(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE items (id INT NOT NULL, name VARCHAR(20), val DOUBLE)")
    for i in range(100):
        st.execute(f"INSERT INTO items VALUES ({i}, 'n{i}', {i * 1.5})")
    st.close()
    conn.close()

    df = rd.read_jdbc(
        spark, url, "items",
        partition_column="id", lower=0, upper=100, num_partitions=4,
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    assert df.rdd.getNumPartitions() == 4  # partitioned read, not one task
    assert df.count() == 100
    got = df.filter(F.col("id") < 10).agg(F.sum("val")).collect()[0][0]
    assert got == sum(i * 1.5 for i in range(10))
    # the filter must be pushed into the database query
    pushed = df.filter(F.col("id") < 10)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in pushed and "LessThan(ID,10)" in pushed
