"""Native host runtime: C++ radix sort + dataset IO (built on demand)."""

from radix_sort_tpu.native.host import (
    host_sort,
    host_sort_pairs,
    native_available,
)

__all__ = ["host_sort", "host_sort_pairs", "native_available"]
