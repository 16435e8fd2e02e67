from sivae_tpu.kernels.conv3d import conv3d_same_pallas  # noqa: F401
