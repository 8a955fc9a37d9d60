"""Root training entry (reference train.py:13-48): optionally connects back
to the web app's /train-ws namespace as a Socket.IO client so the dashboard
receives live events; falls back to console mode when the client library or
server is unavailable."""

import sys
import traceback

from univer_ocr_tpu.models.train import init_emitter, train_model


def bool_convert(arg):
    return {'true': True, 'false': False}.get(str(arg).lower(), arg)


def main(use_gpu=False, console_mode=True, show_progress_bar=False,
         save_train_progress=False):
    client = None

    if bool_convert(console_mode):
        print('Running in console mode')
    else:
        try:
            from univer_ocr_tpu.web.ws_client import connect_train_ws
            client = connect_train_ws()
            init_emitter(client)
        except Exception:
            print('Cannot connect to socket server, running in console mode')

    try:
        train_model(
            bool_convert(use_gpu),
            bool_convert(show_progress_bar),
            bool_convert(save_train_progress),
        )

    except KeyboardInterrupt:
        print('Stopped by keyboard interrupt')

    except Exception as e:
        print(traceback.format_exc())
        raise e

    finally:
        if client is not None:
            client.emit('stop', None)


if __name__ == '__main__':
    main(*sys.argv[1:])
