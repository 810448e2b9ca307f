import logging
import os


def mkdir_or_exist(d):
    os.makedirs(d, exist_ok=True)


def get_logger(name, log_file=None, log_level=logging.INFO):
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    return logger
