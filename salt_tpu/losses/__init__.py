from salt_tpu.losses.lovasz import (lovasz_hinge, lovasz_hinge_flat,
                                    lovasz_grad, lovasz_softmax,
                                    stable_bce_with_logits)
from salt_tpu.losses.dice import (dice_loss, multiclass_dice_loss,
                                  mixed_dice_bce_loss,
                                  mixed_dice_cross_entropy_loss)
from salt_tpu.losses.api import get_loss_fn
