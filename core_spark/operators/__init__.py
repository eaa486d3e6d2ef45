"""Custom operators: the pieces Gazette semantics need that are not a
single Spark built-in, each expressed as a composition of DataFrame
ops (preferred) or a documented Pandas-UDF fallback."""
