from gftorf_tpu.models.gaussians import (
    GaussianParams,
    GaussianAux,
    AdamState,
    GaussianModelState,
)
from gftorf_tpu.models.deform import DeformParams, init_deform, apply_deform
