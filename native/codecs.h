// Native CRAM entropy-codec entry points (codecs.cpp).
#pragma once
#define PY_SSIZE_T_CLEAN
#include <Python.h>

PyObject *codec_rans4x8(PyObject *, PyObject *);
PyObject *codec_rans4x16(PyObject *, PyObject *);
