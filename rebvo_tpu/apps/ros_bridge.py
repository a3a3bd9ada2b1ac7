"""ROS bridge (optional): maps the reference's rebvo_ros nodelet surface
(reference ros/src/rebvo_ros/src/rebvo_nodelet.cpp:36-250) onto
VOSystem's push API. Imports rospy lazily; in environments without ROS
(like TPU pods) the module still imports and documents the mapping:

    image topic  -> VOSystem.process_frame   (requestCustomCamBuffer role)
    imu topic    -> VOSystem.pushIMU
    output       -> edge-map + pose publishers via setOutputCallback
"""

from __future__ import annotations

import numpy as np


def make_node(params=None, image_topic: str = "/cam0/image_raw",
              imu_topic: str = "/imu0"):
    try:
        import rospy
        from sensor_msgs.msg import Image, Imu
        from geometry_msgs.msg import PoseStamped
    except ImportError as e:      # pragma: no cover - no ROS in TPU envs
        raise RuntimeError(
            "rospy unavailable: the ROS bridge requires a ROS environment; "
            "on TPU hosts use io.telemetry for streaming instead") from e

    from rebvo_tpu.system import VOSystem

    sys_ = VOSystem(params)
    pose_pub = rospy.Publisher("rebvo_tpu/pose", PoseStamped, queue_size=2)

    def on_image(msg: "Image"):
        arr = np.frombuffer(msg.data, np.uint8).reshape(msg.height,
                                                        msg.width, -1)
        gray = arr[..., :3].astype(np.float32).sum(-1) if arr.ndim == 3 \
            else arr.astype(np.float32) * 3.0
        t = msg.header.stamp.to_sec()
        out = sys_.process_frame(gray, t)
        if out is None:
            return
        msg_out = PoseStamped()
        msg_out.header.stamp = msg.header.stamp
        pos = np.asarray(out.nav.Pos)
        msg_out.pose.position.x = float(pos[0])
        msg_out.pose.position.y = float(pos[1])
        msg_out.pose.position.z = float(pos[2])
        pose_pub.publish(msg_out)

    def on_imu(msg: "Imu"):
        sys_.pushIMU(msg.header.stamp.to_sec(),
                     [msg.angular_velocity.x, msg.angular_velocity.y,
                      msg.angular_velocity.z],
                     [msg.linear_acceleration.x, msg.linear_acceleration.y,
                      msg.linear_acceleration.z])

    rospy.Subscriber(image_topic, Image, on_image, queue_size=2)
    rospy.Subscriber(imu_topic, Imu, on_imu, queue_size=200)
    return sys_
