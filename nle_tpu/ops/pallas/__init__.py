from nle_tpu.ops.pallas.affinity_kernel import affinity_matmul_pallas

__all__ = ["affinity_matmul_pallas"]
