from .registry import QUERIES, ORACLES, register, query_fns, oracle_sqls  # noqa: F401
