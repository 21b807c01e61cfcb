from nbody_tpu.utils.profiling import StepTimer, fetch, timed, trace
