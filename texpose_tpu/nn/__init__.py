from .init import xavier_uniform, dense_init, conv_init
from .mlp import dense, relu, leaky_relu, softplus, DENSITY_ACTIVATIONS
from .fields import (
    get_layer_dims, init_nerf, apply_nerf, forward_samples_nerf,
    init_nerf_st, apply_nerf_st, forward_samples_nerf_st,
    init_trunk, apply_trunk,
)
from .discriminator import (
    init_discriminator, apply_discriminator, sn_apply, instance_norm,
    sn_normalize_disc,
)
from .vgg import (init_vgg19, load_vgg19_npz, vgg19_features,
                  perceptual_loss, perceptual_loss_pairs)
from .lpips import init_lpips, load_lpips_npz, lpips_distance
