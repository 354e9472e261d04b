"""Pure computational kernels.

Everything in this package is plain Python/numpy with no Spark dependency.
Kernels are invoked only from inside Arrow-batched ``mapInPandas`` stages
(operators/extract.py) or at plan-build time on the driver, never per-row
from Spark SQL.
"""
