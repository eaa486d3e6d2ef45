"""Journal storage layer: append-only parquet-fragment directories with
a versioned manifest — the Spark-native re-expression of Gazette's
broker storage (fragments in a BLOB store + offset index)."""
