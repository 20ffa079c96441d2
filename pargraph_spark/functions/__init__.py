"""Pure deterministic kernels + column-expression builders.

Everything here is either (a) dependency-free pure Python shared verbatim
between the Spark Arrow UDFs and the pytest oracles (extract, urlnorm), or
(b) builders returning pyspark Column expressions that stay JVM-side
(text analysis, hashing) so the hot path never enters per-row Python.
"""
