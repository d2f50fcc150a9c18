from .repellency_kernels import rbf_negative_score, sparse_repellency_force

__all__ = ["rbf_negative_score", "sparse_repellency_force"]
