from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import rotations, cameras  # noqa: F401
