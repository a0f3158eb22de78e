"""Error taxonomy mirroring the reference's KMCUDAResult.

The reference defines a C result enum (reference src/kmcuda.h:41-54) and maps
each code to a Python exception at the binding layer (reference
src/python.cc:365-409):

- ``kmcudaInvalidArguments``        -> ``ValueError``
- ``kmcudaNoSuchDevice``            -> ``ValueError`` ("No such CUDA device exists")
- ``kmcudaMemoryAllocationFailure`` -> ``MemoryError``
- ``kmcudaMemoryCopyError``         -> ``RuntimeError``
- ``kmcudaRuntimeError``            -> ``AssertionError`` ("failure (bug?)")

We reproduce the same taxonomy: a :class:`KMTPUResult` enum usable from the C
ABI shim, and exception classes that inherit from *both* KMTPUError and the
stdlib exception the reference raised, so existing ``except ValueError:``
call-site code keeps working.
"""

import enum


class KMTPUResult(enum.IntEnum):
    """Status codes, value-compatible with KMCUDAResult (kmcuda.h:41-54)."""

    SUCCESS = 0
    INVALID_ARGUMENTS = 1
    NO_SUCH_DEVICE = 2
    MEMORY_ALLOCATION_FAILURE = 3
    RUNTIME_ERROR = 4
    MEMORY_COPY_ERROR = 5


class KMTPUError(Exception):
    """Base class for all libKMTPU errors."""

    result = KMTPUResult.RUNTIME_ERROR


class KMTPUInvalidArguments(KMTPUError, ValueError):
    result = KMTPUResult.INVALID_ARGUMENTS


class KMTPUNoSuchDevice(KMTPUError, ValueError):
    result = KMTPUResult.NO_SUCH_DEVICE


class KMTPUMemoryAllocationFailure(KMTPUError, MemoryError):
    result = KMTPUResult.MEMORY_ALLOCATION_FAILURE


class KMTPURuntimeError(KMTPUError, AssertionError):
    result = KMTPUResult.RUNTIME_ERROR


class KMTPUMemoryCopyError(KMTPUError, RuntimeError):
    result = KMTPUResult.MEMORY_COPY_ERROR


#: result code -> exception class, the analog of the ``statuses`` map the
#: reference exports for wrapper authors (kmcuda.h:186-194).
statuses = {
    KMTPUResult.INVALID_ARGUMENTS: KMTPUInvalidArguments,
    KMTPUResult.NO_SUCH_DEVICE: KMTPUNoSuchDevice,
    KMTPUResult.MEMORY_ALLOCATION_FAILURE: KMTPUMemoryAllocationFailure,
    KMTPUResult.RUNTIME_ERROR: KMTPURuntimeError,
    KMTPUResult.MEMORY_COPY_ERROR: KMTPUMemoryCopyError,
}


def raise_for_status(result: KMTPUResult, message: str = "") -> None:
    """Raise the mapped exception for a non-success result code."""
    if result == KMTPUResult.SUCCESS:
        return
    exc = statuses.get(KMTPUResult(result), KMTPURuntimeError)
    raise exc(message or exc.__name__)
