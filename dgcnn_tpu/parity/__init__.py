from dgcnn_tpu.parity.convert import params_to_torch_state, torch_state_to_params

__all__ = ["params_to_torch_state", "torch_state_to_params"]
