from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh  # noqa: F401
