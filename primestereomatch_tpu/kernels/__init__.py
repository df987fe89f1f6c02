from primestereomatch_tpu.kernels.wmf_pallas import joint_wmf_pallas  # noqa: F401
