#request setxwintype "desktop"
