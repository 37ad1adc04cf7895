"""Pure-Python reference semantics (no Spark imports).

Every module here is picklable/importable on Spark executors and is shared
between the in-repo oracle (tests) and the vectorized UDFs (pipeline), so
distributed-vs-oracle parity reduces to verifying the Spark plumbing.
"""
