def is_module_wrapper(module):
    return False
