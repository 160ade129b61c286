from .oks_kernel import oks_matrix_pallas

__all__ = ["oks_matrix_pallas"]
