"""Metrics object (reference surface: python/tuplex/metrics.py:27-104).

The reference reports LLVM/logical optimization and compilation times; the
Spark-first analogs are UDF AST->Column translation time (our compilation),
Catalyst's own planning (not separately observable from PySpark — folded
into run time), and action wall time.  Exposed via ``Context.metrics``.
"""

from __future__ import annotations


class Metrics:
    def __init__(self):
        self.totalCompilationTime = 0.0   # UDF -> Column translation (s)
        self.compiledUDFs = 0
        self.fallbackUDFs = 0
        self.totalRunTime = 0.0           # sum of action wall times (s)
        self.numActions = 0
        self.totalExceptionCount = 0
        self.lastActionRowCount = 0

    # reference-parity aliases
    @property
    def logicalOptimizationTime(self) -> float:
        return self.totalCompilationTime

    @property
    def llvmOptimizationTime(self) -> float:
        return 0.0  # Catalyst/Tungsten handles this inside Spark

    @property
    def llvmCompilationTime(self) -> float:
        return 0.0

    # the reference capitalizes the acronym (metrics.py:66,76) — a
    # drop-in user calls metrics.LLVMOptimizationTime
    @property
    def LLVMOptimizationTime(self) -> float:
        return self.llvmOptimizationTime

    @property
    def LLVMCompilationTime(self) -> float:
        return self.llvmCompilationTime

    def as_json(self) -> str:
        """JSON string of the metrics (reference metrics.py:95)."""
        import json
        return json.dumps(self.as_dict())

    def as_dict(self) -> dict:
        return {
            "totalCompilationTime": self.totalCompilationTime,
            "compiledUDFs": self.compiledUDFs,
            "fallbackUDFs": self.fallbackUDFs,
            "totalRunTime": self.totalRunTime,
            "numActions": self.numActions,
            "totalExceptionCount": self.totalExceptionCount,
            "lastActionRowCount": self.lastActionRowCount,
        }

    def __repr__(self):
        return f"Metrics({self.as_dict()})"
