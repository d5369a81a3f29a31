"""Pure deterministic kernels shared by the Spark UDFs and the pandas oracle.

Everything here is plain Python/numpy with no Spark dependency, so the exact
same bytes run inside Arrow UDF workers, in the plain-pandas reference oracle,
and in pytest — which is what makes byte-identity and P/R == 1.0 provable.
"""
