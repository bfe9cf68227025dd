from awesome_tpu.fit.optim import (  # noqa: F401
    adamax_init,
    adamax_update,
    adam_init,
    adam_update,
    plateau_init,
    plateau_update,
)
from awesome_tpu.fit.prior_fit import (  # noqa: F401
    FitConfig,
    fit_prior,
    fit_priors_batched,
    fit_priors_sequential,
    learn_flow_identity,
    learn_convex_net,
)
