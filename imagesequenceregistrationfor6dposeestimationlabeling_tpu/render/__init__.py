from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import raymarch, renderer  # noqa: F401
