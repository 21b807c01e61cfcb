from nbody_tpu.train.trainer import TrainState, make_train_step, make_eval_step, Trainer
