/* Stub libv4l2 so the prebuilt reference binary (rebvorun) can load in
 * this container for the golden parity harness (PARITY_r03). The binary
 * links libv4l2 for its live-camera driver (v4lcam), which the parity
 * runs never use (CameraType=2, DataSetCam) — these symbols only need
 * to exist, and fail loudly if ever called.
 *
 * Build: gcc -shared -fPIC -o libv4l2.so.0 v4l2_stub.c
 */
#include <errno.h>
#include <stddef.h>

int v4l2_open(const char *file, int oflag, ...) {
  (void)file; (void)oflag; errno = ENODEV; return -1;
}
int v4l2_close(int fd) { (void)fd; return 0; }
int v4l2_ioctl(int fd, unsigned long int request, ...) {
  (void)fd; (void)request; errno = ENODEV; return -1;
}
void *v4l2_mmap(void *start, size_t length, int prot, int flags, int fd,
                long int offset) {
  (void)start; (void)length; (void)prot; (void)flags; (void)fd;
  (void)offset; errno = ENODEV; return (void *)-1;
}
int v4l2_munmap(void *start, size_t length) {
  (void)start; (void)length; return 0;
}
