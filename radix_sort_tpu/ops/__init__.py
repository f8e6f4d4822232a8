from radix_sort_tpu.ops.sort import sort, argsort, sort_pairs, counting_sort

__all__ = ["sort", "argsort", "sort_pairs", "counting_sort"]
