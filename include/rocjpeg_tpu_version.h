/* Version constants for the rocjpeg_tpu C ABI — the analog of the
 * reference's api/rocjpeg_version.h:36-38 (major/minor/patch macros kept in
 * lockstep with the Python package's rocjpeg_tpu.__version__). */

#ifndef ROCJPEG_TPU_VERSION_H_
#define ROCJPEG_TPU_VERSION_H_

#define ROCJPEG_TPU_MAJOR_VERSION 0
#define ROCJPEG_TPU_MINOR_VERSION 4
#define ROCJPEG_TPU_PATCH_VERSION 0

#define ROCJPEG_TPU_VERSION_STR "0.3.0"

#endif /* ROCJPEG_TPU_VERSION_H_ */
