from .discriminator import (discriminator_apply, discriminator_embeds,  # noqa: F401
                            discriminator_logits, init_discriminator)
from .generator import generator_apply, init_generator  # noqa: F401
from .text_encoder import (convert_torch_state_dict, init_text_encoder,  # noqa: F401
                           load_text_encoder, text_encoder_apply)
