"""TPU-native image-sequence registration for 6D pose-estimation labeling.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference pipeline (Kudo510/ImageSequenceRegistrationfor6DPoseEstimationLabeling):
register two image sequences of one object into a single reference frame by

1. training a NeRF per half-sequence,
2. extracting the object surface + per-view 3D correspondences,
3. training a SurfEmb-style contrastive descriptor (CNN queries vs NeRF keys),
4. dense 2D->3D correspondence + PnP-RANSAC per image of the other sequence,
5. cross-image agreement selection + ICP refinement + Chamfer evaluation.

Everything on the compute path is jittable JAX with static shapes; hot ops
(correspondence similarity, nearest-neighbor reductions) have Pallas TPU
kernels; parallelism is expressed with ``jax.sharding.Mesh`` over rays,
pose hypotheses and point-cloud tiles.
"""

__version__ = "0.1.0"

from imagesequenceregistrationfor6dposeestimationlabeling_tpu import config  # noqa: F401

# Short alias commonly used in docs/tests:  import ...labeling_tpu as isr
