from dgcnn_tpu.kernels.spmm_pallas import spmm_pallas, spmm_pallas_fits

__all__ = ["spmm_pallas", "spmm_pallas_fits"]
