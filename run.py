"""Generic subcommand dispatcher (reference run.py:10-26).

    python run.py <module> [use_gpu] [args...]

where <module> is one of generate_data, train, predict,
crop_and_rotate_benchmark, ... — resolved inside univer_ocr_tpu.models
(train is special-cased to the repo-root trainer with emitter support).
Positional 'true'/'false' strings are coerced to bools.
"""

import importlib
import sys
import traceback


def bool_convert(arg):
    return {'true': True, 'false': False}.get(str(arg).lower(), arg)


def main(module_name, use_gpu=False, *args, **kwargs):
    try:
        if module_name == 'train':
            import_path = 'train'
        else:
            import_path = 'univer_ocr_tpu.models.' + module_name
        imported = importlib.import_module(import_path)
        args = [bool_convert(arg) for arg in args]
        imported.main(str(use_gpu).lower() == 'true', *args, **kwargs)

    except Exception as e:
        print(traceback.format_exc())
        raise e


if __name__ == '__main__':
    main(*sys.argv[1:])
