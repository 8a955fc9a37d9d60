"""Loss functions as pure scalar-valued fns (differentiated with jax.grad).

The reference fuses each loss with its analytic gradient (losses.py:9-73);
here the loss alone is defined and `jax.value_and_grad` supplies the
gradient.  The analytic formulas in the reference are the true derivatives
of these exact expressions (same eps placement, same batch normalization),
so autodiff reproduces them to float precision — asserted by
tests/test_losses.py against NumPy re-derivations of the reference math.
"""

import jax.numpy as jnp

EPS = 1e-8


def segmentation_dice_2d(prediction, ground_truth):
    """Soft Dice over (B, H, W, C), summed over batch and channels.

    Reference losses.py:9-25: per-(batch, channel) dice with eps=1e-8 in the
    numerator and 2*eps in the denominator, loss = sum(1 - 2*num/den).
    """
    num = jnp.sum(prediction * ground_truth, axis=(1, 2)) + EPS
    den = (jnp.sum(prediction, axis=(1, 2))
           + jnp.sum(ground_truth, axis=(1, 2)) + 2 * EPS)
    return jnp.sum(1 - 2 * num / den)


def segmentation_jaccard_2d(prediction, ground_truth):
    """Soft Jaccard/IoU (reference losses.py:28-42)."""
    num = jnp.sum(prediction * ground_truth, axis=(1, 2)) + EPS
    den = (jnp.sum(prediction, axis=(1, 2))
           + jnp.sum(ground_truth, axis=(1, 2)) - num + 2 * EPS)
    return jnp.sum(1 - num / den)


def sigmoid_cross_entropy(prediction, ground_truth):
    """Sigmoid + binary CE over logits, mean over batch (losses.py:45-57).

    Kept in the reference's direct form (log of sigmoid) rather than the
    numerically-stabler log1p(exp(-|x|)) form, for exact value parity; the
    Sigmoid layer upstream keeps activations in range in practice.
    """
    pred = 1 / (1 + jnp.exp(-prediction))
    batch_size = ground_truth.shape[0]
    return -(jnp.sum(ground_truth * jnp.log(pred)
                     + (1 - ground_truth) * jnp.log(1 - pred))) / batch_size


def softmax_cross_entropy(prediction, ground_truth):
    """Max-subtracted softmax CE over (B, n_classes) (losses.py:60-73)."""
    shifted = prediction - jnp.max(prediction, axis=1, keepdims=True)
    log_probs = shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
    batch_size = ground_truth.shape[0]
    return -jnp.sum(ground_truth * log_probs) / batch_size
