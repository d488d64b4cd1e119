"""Pure-Python deterministic kernels.

No Spark imports allowed in this subpackage: every function here must
run identically (a) in-process as the reference/oracle path and (b)
inside an Arrow-batched pandas UDF on executors.  Determinism rules:
no wall-clock, no unseeded RNG, no environment-dependent behavior.
"""
