"""The aero-publish half: wideband IQ -> batched VFO channelizer -> topics.

Replaces the reference's per-sample VFO tree (publish/vfo.cpp) with batched
block processing: main VFOs (mix + halfband cascade) vmapped over one
wideband input, sub VFOs (mix + cascade + optional 5/6 late decimation +
USB demod or IQ compression) vmapped per group, all driven by the same
SDRReceiver-compatible INI config.
"""

from aero_tpu.channelizer.config import (ChannelizerConfig, MainVfoConfig,
                                         SubVfoConfig, load_ini)
from aero_tpu.channelizer.channelizer import Channelizer
