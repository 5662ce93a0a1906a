"""Guided-diffusion script-surface support: model/diffusion builders,
image-folder data, and the generic train loop behind `scripts/guided/*`
(counterpart of the reference's vendored
`flowdiffusion/guided_diffusion/guided_diffusion/{script_util,image_datasets,train_util}.py`)."""

from v2a_tpu.guided.script_util import (  # noqa: F401
    NUM_CLASSES,
    classifier_and_diffusion_defaults,
    classifier_defaults,
    create_classifier_and_diffusion,
    create_gaussian_diffusion,
    create_model_and_diffusion,
    diffusion_defaults,
    model_and_diffusion_defaults,
    parser_from_defaults,
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)
