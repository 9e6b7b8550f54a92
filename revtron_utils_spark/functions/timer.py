"""``timer`` decorator — parity with the reference's
``/root/reference/revtron/functions/time/timer.py:6-24``: supports both the
bare ``@timer`` and parameterized ``@timer(text=...)`` forms and prints
``qualname, elapsed_seconds, text``. Additionally tags the Spark UI job
description (``setJobDescription``) so driver-side timing lines up with the
Spark jobs the call produced."""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

from pyspark.sql import SparkSession


def timer(func: Callable | None = None, *, text: str | None = None, verbose: bool = True):
    def decorate(f: Callable) -> Callable:
        @functools.wraps(f)
        def wrapper(*args: Any, **kwargs: Any):
            spark = SparkSession.getActiveSession()
            if spark is not None:
                spark.sparkContext.setJobDescription(
                    f"{f.__qualname__}" + (f" — {text}" if text else "")
                )
            start = time.perf_counter()
            try:
                return f(*args, **kwargs)
            finally:
                elapsed = time.perf_counter() - start
                if verbose:
                    print(f"{f.__qualname__}, {elapsed:.4f} seconds" + (f", {text}" if text else ""))
                wrapper.last_elapsed = elapsed
                if spark is not None:
                    spark.sparkContext.setJobDescription(None)

        wrapper.last_elapsed = None
        return wrapper

    if func is not None and callable(func):
        return decorate(func)
    return decorate
