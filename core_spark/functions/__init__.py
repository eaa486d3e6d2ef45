"""Column-expression libraries shared by operators and the query plans.

Every function here has two faces:
- a Spark `Column` expression builder (JVM-side, codegen'd — no UDFs), and
- a DuckDB SQL fragment generator producing *identical values*, used to
  build the oracle strings the driver cross-checks.
"""
