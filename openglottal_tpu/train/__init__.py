from openglottal_tpu.train.unet_trainer import UNetTrainer, unet_train_step  # noqa: F401
