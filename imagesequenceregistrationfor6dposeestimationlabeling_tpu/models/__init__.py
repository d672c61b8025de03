from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields  # noqa: F401
