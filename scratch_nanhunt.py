import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"
os.environ["JAX_DEBUG_NANS"] = "True"
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_debug_nans", True)

from mitgcm_tpu.model.experiment import Experiment

DIR = "/root/reference/verification/tutorial_tracer_adjsens"
exp = Experiment.from_dir(DIR + "/input_ad", grid_dir=os.pathsep.join(
    [DIR + "/input_ad", "/root/reference/verification/exp2/input",
     "/root/reference/verification/isomip/input_ad"]), strict_config=True)
recs = exp.run(4)
print("theta_max rec1:", recs[1].get("dynstat_theta_max"))
