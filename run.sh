#!/bin/sh
# reference run.cmd analog
python run.py "$@"
