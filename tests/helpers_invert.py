"""Back-compat shim: the inverse converters moved into the library
(models/weights_export.py) when the ESD trainer started exporting erased
checkpoints in the torch interchange layout. Tests keep importing from
here."""

from safe_denoiser_tpu.models.weights_export import (  # noqa: F401
    invert_mmdit, invert_unet, invert_vae)
